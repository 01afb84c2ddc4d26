"""P-frame (zero-MV skip) conformance and device/reference parity.

The reference transcoder inherited inter coding from x265/NVENC presets
(reference core/transcoder.py:452-535 keyint handling); here the GOP
structure, skip decision, and P-slice syntax are first-party.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def _sequence(W=64, H=48, F=4, bd=8, seed=7, motion=True):
    rng = np.random.default_rng(seed)
    maxv = (1 << bd) - 1
    bg = rng.integers(0, maxv + 1, (H, W), np.int64)
    frames = []
    for t in range(F):
        y = bg.copy()
        if motion:
            x0 = (6 + 11 * t) % (W - 18)
            y[10:34, x0:x0 + 16] = maxv * 4 // 5
        y = np.clip(y + rng.integers(-2, 3, (H, W)), 0, maxv)
        cb = np.clip(np.full((H // 2, W // 2), maxv // 2, np.int64)
                     + rng.integers(-3, 4, (H // 2, W // 2)), 0, maxv)
        cr = np.clip(np.full((H // 2, W // 2), maxv // 2 + 5, np.int64)
                     + rng.integers(-3, 4, (H // 2, W // 2)), 0, maxv)
        frames.append(tuple(a.astype(np.int32) for a in (y, cb, cr)))
    return frames


def _avref_exact(stream: bytes, recons, tmp_path) -> bool:
    p = tmp_path / "s.hevc"
    p.write_bytes(stream)
    av = avref.decode_file(str(p))
    if len(av) != len(recons):
        return False
    return all(np.array_equal(av[i][j].astype(np.int32), recons[i][k])
               for i in range(len(av))
               for j, k in ((0, "y"), (1, "cb"), (2, "cr")))


@pytest.mark.parametrize("qp,bd,tiles,deblock,mc", [
    (30, 8, (1, 1), True, False),
    (38, 8, (2, 2), True, False),
    (30, 10, (1, 1), True, False),
    (45, 8, (1, 1), False, False),
    (30, 8, (1, 1), True, True),
    (37, 8, (2, 2), True, True),
    (30, 10, (1, 1), True, True),
])
def test_pframes_conformance(qp, bd, tiles, deblock, mc, tmp_path):
    frames = _sequence(bd=bd, seed=qp)
    cfg = StreamConfig(width=64, height=48, qp=qp, bit_depth=bd,
                       tile_cols=tiles[0], tile_rows=tiles[1],
                       deblock=deblock, inter=True,
                       profile_idc=2 if bd == 10 else 1)
    enc = RefIntraEncoderV1(cfg, mc=mc)
    stream, recons = enc.encode_video(frames, gop=3)  # IDR mid-stream too
    # own conformance decoder
    dec = decode_annexb(stream)
    assert len(dec) == len(frames)
    assert any(f["skip_map"].any() for f in dec[1:]), "no CTU chose skip"
    for i, f in enumerate(dec):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(f[k], recons[i][k]), (i, k)
    # independent decoder
    assert _avref_exact(stream, recons, tmp_path)


def _pan_sequence(W=96, H=64, F=4, seed=0, step=(2, 3)):
    """Smooth texture panned by `step` px/frame: true-motion content."""
    from numpy.lib.stride_tricks import sliding_window_view
    rng = np.random.default_rng(seed)
    base = np.kron(rng.integers(0, 256, (H // 4 + 40, W // 4 + 40)),
                   np.ones((4, 4)))
    tex = sliding_window_view(base, (5, 5)).reshape(
        base.shape[0] - 4, base.shape[1] - 4, 25).mean(-1)
    frames = []
    for t in range(F):
        oy, ox = 8 + step[0] * t, 10 + step[1] * t
        y = np.clip(tex[oy:oy + H, ox:ox + W]
                    + rng.integers(-1, 2, (H, W)), 0, 255).astype(np.int32)
        cb = np.clip(tex[oy // 2:oy // 2 + H // 2,
                         ox // 2:ox // 2 + W // 2] * .4 + 76,
                     0, 255).astype(np.int32)
        cr = np.clip(153 - tex[oy // 2 + 2:oy // 2 + 2 + H // 2,
                               ox // 2 + 4:ox // 2 + 4 + W // 2] * .3,
                     0, 255).astype(np.int32)
        frames.append((y, cb, cr))
    return frames


def test_mc_inter_beats_intra_on_panning_content(tmp_path):
    frames = _pan_sequence()
    cfg = StreamConfig(width=96, height=64, qp=30, inter=True)
    s_mc, r_mc = RefIntraEncoderV1(cfg, mc=True).encode_video(frames)
    s_zm, _ = RefIntraEncoderV1(cfg, mc=False).encode_video(frames)
    assert len(s_mc) < len(s_zm) // 2, (len(s_mc), len(s_zm))
    dec = decode_annexb(s_mc)
    assert any((~f["cu_maps"]["intra"]).any() for f in dec[1:])
    for i, f in enumerate(dec):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(f[k], r_mc[i][k]), (i, k)
    assert _avref_exact(s_mc, r_mc, tmp_path)


def test_all_static_sequence_codes_inter(tmp_path):
    frames = _sequence(motion=False, seed=3)
    cfg = StreamConfig(width=64, height=48, qp=32, inter=True)
    stream, recons = RefIntraEncoderV1(cfg).encode_video(frames)
    s_intra, _ = RefIntraEncoderV1(cfg).encode_video(frames, gop=1)
    dec = decode_annexb(stream)
    # noise-only deltas: every P CTU codes inter, many as pure skip, and
    # the stream is a fraction of the all-intra one
    assert all((~f["cu_maps"]["intra"]).all() for f in dec[1:])
    total = sum(int(f["skip_map"].sum()) for f in dec[1:])
    assert total >= sum(f["skip_map"].size for f in dec[1:]) // 3
    assert len(stream) < len(s_intra) // 2
    assert _avref_exact(stream, recons, tmp_path)


@pytest.mark.slow
def test_device_gop_matches_reference(tmp_path):
    """Device graph parity for the zero-MV-skip profile (mc=False)."""
    from hevc_tpu.encoder.gop import GopEncoder
    frames = _sequence(W=64, H=48, F=3)
    cfg = StreamConfig(width=64, height=48, qp=32, inter=True)
    s_ref, r_ref = RefIntraEncoderV1(cfg, mc=False).encode_video(frames)
    s_jax, r_jax = GopEncoder(cfg, mc=False).encode_video(frames)
    assert s_ref == s_jax
    for i in range(len(frames)):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(r_ref[i][k], r_jax[i][k])
    assert _avref_exact(s_jax, r_jax, tmp_path)


def test_cpp_p_entropy_identical():
    """C++ P-slice tile entropy must be byte-identical to Python."""
    from hevc_tpu.entropy import binding
    from hevc_tpu.entropy.tiled_v1 import encode_tile_payload_v1, \
        _arrays_to_ctus
    if not binding.available():
        pytest.skip("C++ entropy unavailable")
    rng = np.random.default_rng(1)
    nh, nw = 4, 5
    inter = (rng.random((nh, nw)) < 0.5)
    merge = (rng.random((nh, nw)) < 0.5)
    rqt = (rng.random((nh, nw)) < 0.7).astype(np.int32)
    d = {
        "skip": rng.random((nh, nw)) < 0.3,
        "inter": inter,
        "merge": merge,
        "mvd": rng.integers(-70, 71, (nh, nw, 2), np.int16),
        "mvp": rng.integers(0, 2, (nh, nw), np.int32),
        "rqt": rqt,
        "cbf_yi": np.ones((nh, nw), np.uint8),
        "cbf_cbi": (rng.random((nh, nw)) < 0.5).astype(np.uint8),
        "cbf_cri": (rng.random((nh, nw)) < 0.5).astype(np.uint8),
        "part_nxn": rng.random((nh, nw)) < 0.4,
        "modes4": rng.integers(0, 35, (nh, nw, 4), np.int32),
        "cbf_y4": np.ones((nh, nw, 4), np.uint8),
        "cbf_cb4": np.ones((nh, nw, 4), np.uint8),
        "cbf_cr4": np.ones((nh, nw, 4), np.uint8),
        "cbf_cb": np.ones((nh, nw), np.uint8),
        "cbf_cr": np.ones((nh, nw), np.uint8),
        "lvl_y": rng.integers(-30, 31, (nh, nw, 16, 16), np.int16),
        "lvl_cb": rng.integers(-8, 9, (nh, nw, 8, 8), np.int16),
        "lvl_cr": rng.integers(-8, 9, (nh, nw, 8, 8), np.int16),
    }
    d["lvl_y"][..., 0, 0] = 3          # keep cbf=1 consistent
    d["lvl_cb"][..., 0, 0] = 2
    d["lvl_cr"][..., 0, 0] = 2
    d["lvl_y"][..., 8, 8] = 3          # every NxN quadrant nonzero
    d["lvl_cb"][..., 4, 4] = 2
    d["lvl_cr"][..., 4, 4] = 2
    d["lvl_y"][..., 0, 8] = 3
    d["lvl_y"][..., 8, 0] = 3
    d["lvl_cb"][..., 0, 4] = 2
    d["lvl_cb"][..., 4, 0] = 2
    d["lvl_cr"][..., 0, 4] = 2
    d["lvl_cr"][..., 4, 0] = 2
    for qp in (12, 30, 47):
        for last in (False, True):
            cfg = StreamConfig(width=nw * 16, height=nh * 16, qp=qp)
            ctus = _arrays_to_ctus(d, 0, 0, nh, nw)
            py = encode_tile_payload_v1(cfg, ctus, last, p_slice=True)
            cpp = binding.encode_tile_payload_v1(qp, d, 0, 0, nh, nw, last,
                                                 p_slice=True)
            assert py == cpp


@pytest.mark.slow
def test_device_mc_gop_matches_reference(tmp_path):
    """Device MC kernel == numpy reference (mc=True, subpel=False)."""
    from hevc_tpu.encoder.gop import GopEncoder
    frames = _pan_sequence(W=96, H=64, F=3, step=(2, 3))
    cfg = StreamConfig(width=96, height=64, qp=32, inter=True,
                       tile_cols=2, tile_rows=2)
    s_ref, r_ref = RefIntraEncoderV1(cfg).encode_video(frames)
    s_jax, r_jax = GopEncoder(cfg).encode_video(frames)
    assert s_ref == s_jax
    for i in range(len(frames)):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(r_ref[i][k], r_jax[i][k]), (i, k)
    assert _avref_exact(s_jax, r_jax, tmp_path)
    dec = decode_annexb(s_jax)
    assert any((~f["cu_maps"]["intra"]).any() for f in dec[1:])
