"""B-frame (IbPbP GOP, bi-prediction) conformance.

Non-reference TRAIL_N B pictures between TRAIL_R reference P pictures;
decode order differs from display order; merge/AMVP with cross-list POC
scaling; default bi-prediction averaging.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402
from test_pframes import _pan_sequence, _sequence, _avref_exact  # noqa: E402


def _run(frames, cfg, gop=0):
    enc = RefIntraEncoderV1(cfg)
    stream, recons = enc.encode_video(frames, gop=gop)
    dec = decode_annexb(stream)
    assert len(dec) == len(frames)
    for i, f in enumerate(dec):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(f[k], recons[i][k]), (i, k)
    return stream, recons


@pytest.mark.parametrize("qp,bd,tiles,sao,gop", [
    (31, 8, (1, 1), False, 0),
    (31, 8, (2, 2), False, 0),
    (37, 8, (1, 1), True, 0),
    (31, 8, (1, 1), False, 4),     # mid-stream IDR + odd segment tails
    (35, 10, (1, 1), False, 0),
])
def test_bframes_conformance(qp, bd, tiles, sao, gop, tmp_path):
    frames = _pan_sequence(W=96, H=64, F=6, step=(2, 3))
    if bd == 10:
        frames = [tuple(np.asarray(p) * 4 for p in f) for f in frames]
    cfg = StreamConfig(width=96, height=64, qp=qp, bit_depth=bd,
                       tile_cols=tiles[0], tile_rows=tiles[1],
                       inter=True, bframes=True, sao=sao,
                       profile_idc=2 if bd == 10 else 1)
    stream, recons = _run(frames, cfg, gop=gop)
    assert _avref_exact(stream, recons, tmp_path)
    # the stream must actually contain non-reference B pictures
    from hevc_tpu.utils.bitio import split_annexb
    types = [(n[0] >> 1) & 0x3F for n in split_annexb(stream)]
    assert 0 in types and 1 in types        # TRAIL_N (B) and TRAIL_R (P)


def test_bframes_save_rate_on_pan(tmp_path):
    frames = _pan_sequence(W=96, H=64, F=6, step=(2, 3))
    cfg_b = StreamConfig(width=96, height=64, qp=31, inter=True,
                         bframes=True)
    cfg_p = StreamConfig(width=96, height=64, qp=31, inter=True)
    s_b, r_b = _run(frames, cfg_b)
    s_p, _ = RefIntraEncoderV1(cfg_p).encode_video(frames)
    assert len(s_b) < len(s_p)
    assert _avref_exact(s_b, r_b, tmp_path)


def test_bframes_static_sequence(tmp_path):
    frames = _sequence(W=64, H=48, F=5, motion=False, seed=3)
    cfg = StreamConfig(width=64, height=48, qp=32, inter=True, bframes=True)
    stream, recons = _run(frames, cfg)
    assert _avref_exact(stream, recons, tmp_path)


def test_cpp_b_entropy_identical():
    """C++ B-slice tile entropy must be byte-identical to Python."""
    from hevc_tpu.entropy import binding
    from hevc_tpu.entropy.tiled_v1 import encode_tile_payload_v1, \
        _arrays_to_ctus
    if not binding.available():
        pytest.skip("C++ entropy unavailable")
    rng = np.random.default_rng(4)
    nh, nw = 4, 5
    inter = (rng.random((nh, nw)) < 0.6)
    d = {
        "skip": (rng.random((nh, nw)) < 0.3) & ~inter,
        "inter": inter,
        "merge": rng.random((nh, nw)) < 0.4,
        "dir": rng.integers(0, 3, (nh, nw)).astype(np.uint8),
        "mvd": rng.integers(-70, 71, (nh, nw, 2), np.int16),
        "mvd1": rng.integers(-70, 71, (nh, nw, 2), np.int16),
        "mvp": rng.integers(0, 2, (nh, nw), np.int32),
        "mvp1": rng.integers(0, 2, (nh, nw), np.int32),
        "rqt": (rng.random((nh, nw)) < 0.7).astype(np.int32),
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
    for a, v in (("lvl_y", 3), ("lvl_cb", 2), ("lvl_cr", 2)):
        h2, w2 = d[a].shape[-2] // 2, d[a].shape[-1] // 2
        d[a][..., 0, 0] = v
        d[a][..., h2, w2] = v
        d[a][..., 0, w2] = v
        d[a][..., h2, 0] = v
    for last in (False, True):
        for qp in (12, 30, 45):
            cfg = StreamConfig(width=nw * 16, height=nh * 16, qp=qp)
            py = encode_tile_payload_v1(
                cfg, _arrays_to_ctus(d, 0, 0, nh, nw), last,
                p_slice=True, b_slice=True)
            cpp = binding.encode_tile_payload_v1(
                qp, d, 0, 0, nh, nw, last, p_slice=True, b_slice=True)
            assert py == cpp, (last, qp)


def test_mp4_ctts_b_stream(tmp_path):
    """B streams mux with ctts composition offsets; libavformat/libavcodec
    return frames in display order, bit-exact."""
    from hevc_tpu.io.mp4 import mux_mp4
    from hevc_tpu.utils.bitio import split_annexb, length_prefixed
    frames = _pan_sequence(W=96, H=64, F=6, step=(2, 3))
    cfg = StreamConfig(width=96, height=64, qp=31, inter=True, bframes=True)
    stream, recons = RefIntraEncoderV1(cfg).encode_video(frames)
    nals = split_annexb(stream)
    slices = [x for x in nals if ((x[0] >> 1) & 0x3F) < 32]
    assert len(slices) == 6
    # decode order I P2 B1 P4 B3 P5(trailing): display indices per sample
    display = [0, 2, 1, 4, 3, 5]
    comp = [d - i for i, d in enumerate(display)]
    samples = [length_prefixed([s]) for s in slices]
    from hevc_tpu.entropy.headers import write_vps, write_sps, write_pps
    out = tmp_path / "b.mp4"
    mux_mp4(out, samples, cfg, vps=write_vps(cfg), sps=write_sps(cfg),
            pps=write_pps(cfg), sync_samples=[1],
            composition_offsets=comp)
    dec = avref.decode_file(str(out))
    assert len(dec) == 6
    for i in range(6):
        for j, k in ((0, "y"), (1, "cb"), (2, "cr")):
            assert np.array_equal(dec[i][j].astype(np.int32), recons[i][k]), i


@pytest.mark.slow
def test_device_bframes_matches_reference():
    """Device B kernel (encode_tiles_rowscan_bmc_jit) drives the same
    IbPbP stream as the numpy reference encoder, byte-identical."""
    from hevc_tpu.encoder.gop import GopEncoder
    rng = np.random.default_rng(9)
    W, H, N = 96, 64, 9
    base = rng.integers(0, 256, (H, W), np.int32)
    frames = []
    for i in range(N):
        y = np.clip(np.roll(base, i * 3, axis=1)
                    + rng.integers(-4, 5, (H, W)), 0, 255).astype(np.int32)
        cb = np.clip(np.roll(base[::2, ::2], i, axis=0) // 2 + 64
                     + rng.integers(-2, 3, (H // 2, W // 2)),
                     0, 255).astype(np.int32)
        cr = np.clip(255 - base[::2, ::2] // 2
                     + rng.integers(-2, 3, (H // 2, W // 2)),
                     0, 255).astype(np.int32)
        frames.append((y, cb, cr))
    cfg = StreamConfig(width=W, height=H, qp=27, inter=True, bframes=True)
    s_np, _ = RefIntraEncoderV1(cfg).encode_video(frames, gop=6)
    s_dev, _ = GopEncoder(cfg).encode_video(frames, gop=6)
    assert s_np == s_dev
