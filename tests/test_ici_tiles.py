"""Cross-chip single-frame encoding (parallel/tiles.py): the ICI
halo-exchange GOP step must be byte-identical to the single-device
production step (encoder/gop._gop_step_jit) — same kernel decisions,
same deblocked recon, same padded refs — over an IPPP chain on an
8-device mesh (VERDICT r2 missing #6: runtime collectives)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _frames(rng, W, H, n):
    base = rng.integers(0, 256, (H, W), np.int32)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, i * 3, axis=1)
                    + rng.integers(-2, 3, (H, W)), 0, 255).astype(np.int32)
        cb = rng.integers(100, 156, (H // 2, W // 2)).astype(np.int32)
        cr = rng.integers(100, 156, (H // 2, W // 2)).astype(np.int32)
        out.append((y, cb, cr))
    return out


@pytest.mark.slow
def test_ici_step_matches_single_device():
    import jax.numpy as jnp
    from hevc_tpu.encoder.gop import _gop_step_jit, GopEncoder
    from hevc_tpu.encoder.ctu_modes import skip_lambda16
    from hevc_tpu.encoder.rowscan_v1 import RowScanEncoderV1
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.parallel.tiles import (encode_frame_tiles_ici,
                                         make_tile_mesh, zero_pads_ici)

    D = 8
    assert len(jax.devices()) >= D, "conftest forces an 8-device CPU mesh"
    mesh = make_tile_mesh(jax.devices()[:D])

    tnh, tnw, tc_ = 2, 3, D          # 48-px columns: one per device
    W, H = tc_ * tnw * 16, tnh * 16
    QP = 30
    rng = np.random.default_rng(3)
    frames = _frames(rng, W, H, 3)

    cfg = StreamConfig(width=W, height=H, qp=QP, tile_cols=tc_,
                       tile_rows=1, inter=True)
    enc = GopEncoder(cfg)            # only for the block-layout helpers
    rs = RowScanEncoderV1(QP)
    lam16 = jnp.asarray(skip_lambda16(QP), jnp.int32)
    sl16 = jnp.asarray(int(np.sqrt(0.85 * 2 ** ((QP - 12) / 3)) * 16),
                       jnp.int32)
    qpj = jnp.asarray(QP, jnp.int32)

    def blocks(f):
        yb, cbb, crb = enc._to_blocks(*f)
        return (jnp.asarray(enc._tsplit(yb, 16)),
                jnp.asarray(enc._tsplit(cbb, 8)),
                jnp.asarray(enc._tsplit(crb, 8)))

    # ---- single-device reference chain ----
    ref_outs, ref_pads = [], None
    for k, f in enumerate(frames):
        b = blocks(f)
        if k == 0:
            from hevc_tpu.encoder.rowscan_v1 import MARGIN, MARGIN_C
            th, tw = tnh * 16, tnw * 16
            zp = (jnp.zeros((tc_, th + 2 * MARGIN, tw + 2 * MARGIN),
                            jnp.int32),
                  jnp.zeros((tc_, th // 2 + 2 * MARGIN_C,
                             tw // 2 + 2 * MARGIN_C), jnp.int32),
                  jnp.zeros((tc_, th // 2 + 2 * MARGIN_C,
                             tw // 2 + 2 * MARGIN_C), jnp.int32))
            o = _gop_step_jit(*b, *zp, qpj, rs.lam_bits, lam16, sl16,
                              tnh, tnw, 1, tc_, 8, True, True, True,
                              False, True)
        else:
            o = _gop_step_jit(*b, *ref_pads, qpj, rs.lam_bits, lam16, sl16,
                              tnh, tnw, 1, tc_, 8, True, True, False,
                              False, True)
        o = [np.asarray(x) for x in o]
        ref_pads = tuple(jnp.asarray(p) for p in o[-3:])
        ref_outs.append(o)

    # ---- ICI chain: same inputs, tiles sharded, ppermute halo ----
    pads = zero_pads_ici(mesh, tc_, tnh, tnw)
    for k, f in enumerate(frames):
        b = blocks(f)
        outs, deb, pads = encode_frame_tiles_ici(
            mesh, *b, pads, qpj, rs.lam_bits, lam16, sl16, tnh, tnw,
            idr=(k == 0))
        ref = ref_outs[k]
        n_kernel = len(ref) - 6      # ref = kernel outs + (y,cb,cr,pads)
        for i in range(n_kernel):    # every decision / recon / coeff plane
            assert np.array_equal(np.asarray(outs[i]), ref[i]), (k, i)
        for i, nm in enumerate(("dy", "dcb", "dcr")):
            assert np.array_equal(np.asarray(deb[i]),
                                  ref[n_kernel + i]), (k, nm)
        for i, nm in enumerate(("pad_y", "pad_cb", "pad_cr")):
            assert np.array_equal(np.asarray(pads[i]),
                                  ref[n_kernel + 3 + i]), (k, nm)


def test_ici_collective_is_load_bearing():
    """The halo really crosses devices: a P-frame motion vector that
    points past a tile boundary reconstructs from the neighbor device's
    pixels (not edge padding)."""
    import jax.numpy as jnp
    from hevc_tpu.encoder.gop import GopEncoder
    from hevc_tpu.encoder.ctu_modes import skip_lambda16
    from hevc_tpu.encoder.rowscan_v1 import RowScanEncoderV1
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.parallel.tiles import (encode_frame_tiles_ici,
                                         make_tile_mesh, zero_pads_ici)

    D = 8
    mesh = make_tile_mesh(jax.devices()[:D])
    tnh, tnw, tc_ = 2, 3, D
    W, H = tc_ * tnw * 16, tnh * 16
    QP = 30
    rng = np.random.default_rng(11)
    # frame 0: noise; frame 1 (below): frame 0's RECONSTRUCTION shifted
    # 8 px right, so every boundary block's best MV crosses into the left
    # neighbor's columns with an exactly-zero residual (constant chroma
    # keeps the decision pure-luma)
    f0 = _frames(rng, W, H, 1)[0]
    f0 = (f0[0], np.full_like(f0[1], 128), np.full_like(f0[2], 128))

    cfg = StreamConfig(width=W, height=H, qp=QP, tile_cols=tc_,
                       tile_rows=1, inter=True)
    enc = GopEncoder(cfg)
    rs = RowScanEncoderV1(QP)
    lam16 = jnp.asarray(skip_lambda16(QP), jnp.int32)
    sl16 = jnp.asarray(int(np.sqrt(0.85 * 2 ** ((QP - 12) / 3)) * 16),
                       jnp.int32)
    qpj = jnp.asarray(QP, jnp.int32)

    def blocks(f):
        yb, cbb, crb = enc._to_blocks(*f)
        return (jnp.asarray(enc._tsplit(yb, 16)),
                jnp.asarray(enc._tsplit(cbb, 8)),
                jnp.asarray(enc._tsplit(crb, 8)))

    pads = zero_pads_ici(mesh, tc_, tnh, tnw)
    outs, deb0, pads = encode_frame_tiles_ici(
        mesh, *blocks(f0), pads, qpj, rs.lam_bits, lam16, sl16, tnh, tnw,
        idr=True)
    dy0 = np.asarray(deb0[0])
    f1 = (np.roll(dy0, 8, axis=1).astype(np.int32),
          np.full_like(f0[1], 128), np.full_like(f0[2], 128))
    outs, deb, pads = encode_frame_tiles_ici(
        mesh, *blocks(f1), pads, qpj, rs.lam_bits, lam16, sl16, tnh, tnw)
    inter = np.asarray(outs[13]) | np.asarray(outs[14])
    mv = np.asarray(outs[22])
    # the left column of every non-leftmost tile must pick inter with a
    # leftward MV into the neighbor tile (quarter-pel units: -8 px = -32)
    steps = inter.reshape(tnh, tnw, tc_)       # row-scan step-major
    mvx = mv.reshape(tnh, tnw, tc_, 2)[..., 0]
    left_col = steps[:, 0, 1:]
    assert left_col.all(), "boundary CTUs did not choose inter"
    assert (mvx[:, 0, 1:] == -32).all(), mvx[:, 0, 1:]
    # the first 8 px of tile 1's reconstruction are predicted ENTIRELY
    # from tile 0's reference pixels, which live on the other device:
    # they must equal the neighbor's frame-0 reconstruction (skip CUs,
    # BS=0 => no residual, no filtering).  Exact equality is only
    # possible if the true pixels crossed the ICI link — edge-clamped
    # pads would replicate column 47 instead.
    ry = np.asarray(deb[0])
    strip = ry[:, 48:56]
    want = dy0[:, 40:48]
    assert np.array_equal(strip, want), np.abs(strip - want).max()
    assert not np.array_equal(want, np.repeat(dy0[:, 47:48], 8, 1))
