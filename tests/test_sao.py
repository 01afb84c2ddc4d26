"""SAO (sample-adaptive offset) conformance: encode -> decode bit-exact."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def _edgy(W, H, F, bd, seed):
    rng = np.random.default_rng(seed)
    maxv = (1 << bd) - 1
    out = []
    for t in range(F):
        y = np.full((H, W), maxv // 3, np.int64)
        for _ in range(12):
            x0, y0 = rng.integers(0, W - 20), rng.integers(0, H - 12)
            y[y0:y0 + 10, x0:x0 + 18] = rng.integers(0, maxv)
        y[::7] = maxv * 3 // 4
        y = np.clip(y + rng.integers(-2, 3, (H, W)), 0, maxv)
        cb = np.clip(np.full((H // 2, W // 2), maxv // 2, np.int64)
                     + rng.integers(-20, 20, (H // 2, W // 2)), 0, maxv)
        cr = np.clip(np.full((H // 2, W // 2), maxv // 2, np.int64)
                     + rng.integers(-15, 15, (H // 2, W // 2)), 0, maxv)
        out.append(tuple(a.astype(np.int32) for a in (y, cb, cr)))
    return out


@pytest.mark.parametrize("qp,bd,tiles,inter", [
    (37, 8, (1, 1), True),
    (32, 8, (2, 2), True),
    (33, 8, (1, 1), False),   # all-intra stream with SAO
    (40, 10, (1, 1), True),
])
def test_sao_conformance(qp, bd, tiles, inter, tmp_path):
    frames = _edgy(96, 64, 3, bd, qp)
    cfg = StreamConfig(width=96, height=64, qp=qp, bit_depth=bd,
                       tile_cols=tiles[0], tile_rows=tiles[1],
                       inter=True, sao=True,
                       profile_idc=2 if bd == 10 else 1)
    enc = RefIntraEncoderV1(cfg)
    # inter=False case: IDR-only GOP exercises SAO in I slices
    stream, recons = enc.encode_video(frames, gop=0 if inter else 1)
    dec = decode_annexb(stream)
    assert len(dec) == len(frames)
    for i, f in enumerate(dec):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(f[k], recons[i][k]), (i, k)
    p = tmp_path / "s.hevc"
    p.write_bytes(stream)
    av = avref.decode_file(str(p))
    assert len(av) == len(frames)
    for i in range(len(frames)):
        for j, k in ((0, "y"), (1, "cb"), (2, "cr")):
            assert np.array_equal(av[i][j].astype(np.int32), recons[i][k])


def test_sao_improves_edge_content(tmp_path):
    frames = _edgy(96, 64, 3, 8, 5)
    mk = lambda sao: StreamConfig(width=96, height=64, qp=37, inter=True,
                                  sao=sao)
    s1, r1 = RefIntraEncoderV1(mk(True)).encode_video(frames)
    s0, r0 = RefIntraEncoderV1(mk(False)).encode_video(frames)

    def mse(rs):
        return np.mean([np.mean((rs[t]["y"][:64, :96].astype(float)
                                 - frames[t][0]) ** 2) for t in range(3)])
    assert mse(r1) < mse(r0)          # SAO must help where it's chosen
    dec = decode_annexb(s1)
    n_on = sum(1 for f in dec for row in f["sao"][0]
               for pp in row if pp is not None)
    assert n_on > 0


@pytest.mark.slow
def test_device_sao_gop_matches_reference(tmp_path):
    """Device SAO (fused deblock+SAO+pad graph) == numpy reference."""
    from hevc_tpu.encoder.gop import GopEncoder
    frames = _edgy(96, 64, 3, 8, 7)
    cfg = StreamConfig(width=96, height=64, qp=36, inter=True, sao=True,
                       tile_cols=2, tile_rows=2)
    s_ref, r_ref = RefIntraEncoderV1(cfg).encode_video(frames)
    s_jax, r_jax = GopEncoder(cfg).encode_video(frames)
    assert s_ref == s_jax
    for i in range(3):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(r_ref[i][k], r_jax[i][k]), (i, k)
    p = tmp_path / "s.hevc"
    p.write_bytes(s_jax)
    av = avref.decode_file(str(p))
    for i in range(3):
        for j, k in ((0, "y"), (1, "cb"), (2, "cr")):
            assert np.array_equal(av[i][j].astype(np.int32), r_jax[i][k])


@pytest.mark.slow
@pytest.mark.parametrize("bframes", [False, True])
def test_chunked_sao_matches_reference(bframes, tmp_path):
    """SAO inside the chunk scan (production medium path) == numpy.

    Covers VERDICT r2 item 3: the chunked GOP dispatch carries SAO
    (estimation + application + SAO'd DPB feedback) on device; with
    bframes the non-reference B slices code slice_sao_*_flag=0 (shared
    policy with RefIntraEncoderV1._finish_pic).
    """
    from hevc_tpu.encoder.gop import GopEncoder
    frames = _edgy(96, 64, 7, 8, 11)
    mk = lambda: StreamConfig(width=96, height=64, qp=34, inter=True,
                              sao=True, bframes=bframes)
    s_dev = GopEncoder(mk()).encode_video_chunked(frames, gop=6)
    s_ref, r_ref = RefIntraEncoderV1(mk()).encode_video(frames, gop=6)
    assert s_dev == s_ref
    dec = decode_annexb(s_dev)
    assert len(dec) == len(frames)
    p = tmp_path / "s.hevc"
    p.write_bytes(s_dev)
    av = avref.decode_file(str(p))
    assert len(av) == len(frames)
    for i in range(len(frames)):
        for j, k in ((0, "y"), (1, "cb"), (2, "cr")):
            assert np.array_equal(av[i][j].astype(np.int32), r_ref[i][k])
