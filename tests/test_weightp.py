"""Weighted P prediction (x265-medium `weightp`): pred_weight_table
syntax, spec weighting, device==numpy parity, and the independent
libavcodec decode as the conformance oracle (VERDICT r2 missing #4)."""
import numpy as np
import pytest


def _fade_frames(rng, W, H, n, dc=5, roll=1):
    base = rng.integers(20, 170, (H, W), np.int32)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, i * roll, axis=1) + dc * i
                    + rng.integers(-2, 3, (H, W)), 0, 255)
        cb = np.clip(rng.integers(100, 140, (H // 2, W // 2)) + 2 * i,
                     0, 255)
        cr = np.full((H // 2, W // 2), 120 + 2 * i, np.int32)
        out.append(tuple(p.astype(np.int32) for p in (y, cb, cr)))
    return out


def test_weight_table_roundtrip():
    """write_pred_weight_table bits parse back to the same weights."""
    from hevc_tpu.entropy.headers import write_pred_weight_table
    from hevc_tpu.decoder.headers import _parse_pred_weight_table
    from hevc_tpu.utils.bitio import BitWriter
    from hevc_tpu.decoder.headers import BitReader
    for wp in ((64, 0, 64, 0, 64, 0), (70, -3, 64, 2, 60, 0),
               (1, 127, 127, -128, 33, 5), (64, 8, 64, 0, 64, 0)):
        w = BitWriter()
        write_pred_weight_table(w, wp)
        w.bit(1)
        w.byte_align(0)
        got = _parse_pred_weight_table(BitReader(w.bytes()))
        assert got == wp, (wp, got)


def test_weight_uni_w_matches_default_at_64_0():
    from hevc_tpu.ops.inter import weight_uni, weight_uni_w
    rng = np.random.default_rng(0)
    for bd in (8, 10):
        val = rng.integers(-8192, 22000, (16, 16))
        assert np.array_equal(weight_uni_w(val, 64, 0, bd),
                              weight_uni(val, bd))


def test_estimation_finds_fade():
    from hevc_tpu.ops.inter import estimate_weights_p
    rng = np.random.default_rng(1)
    r = rng.integers(30, 200, (64, 64))
    c = np.clip(r + 7, 0, 255)
    wp = estimate_weights_p(c, r, c, r, c, r)
    assert wp[1] == 7 and wp[0] == 64, wp
    # flat gain fade: w moves, offset compensates
    c2 = np.clip((r * 3) // 4, 0, 255)
    wp2 = estimate_weights_p(c2, r, c2, r, c2, r)
    assert wp2[0] < 60, wp2


def test_numpy_weightp_conformant_and_saves_bits():
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
    from hevc_tpu.decoder.decode import decode_annexb
    from hevc_tpu.validate import avref

    rng = np.random.default_rng(4)
    W, H, N = 96, 64, 6
    frames = _fade_frames(rng, W, H, N)
    cfg = StreamConfig(width=W, height=H, qp=30, inter=True, weightp=True)
    stream, recons = RefIntraEncoderV1(cfg).encode_video(frames, gop=0)
    dec = decode_annexb(stream)
    for k, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d["y"][:H, :W], r["y"][:H, :W]), k
        assert np.array_equal(d["cb"][:H // 2, :W // 2],
                              r["cb"][:H // 2, :W // 2]), k
    if avref.available():
        av = avref.decode_file_bytes = avref.decode_hevc(stream)
        for k, (d, r) in enumerate(zip(av, recons)):
            assert np.array_equal(d[0].astype(np.int32),
                                  r["y"][:H, :W]), k
    cfg0 = StreamConfig(width=W, height=H, qp=30, inter=True)
    s0, _ = RefIntraEncoderV1(cfg0).encode_video(frames, gop=0)
    assert len(stream) < len(s0), (len(stream), len(s0))


@pytest.mark.slow
def test_chunked_weightp_matches_numpy_ibpbp():
    """The production chunked device path (IbPbP + SAO + SDH + weightp)
    emits the numpy reference's bytes exactly, and libavcodec decodes
    them bit-exactly."""
    import jax  # noqa: F401  (device path)
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
    from hevc_tpu.encoder.gop import GopEncoder
    from hevc_tpu.validate import avref

    rng = np.random.default_rng(9)
    W, H, N = 96, 64, 9
    frames = _fade_frames(rng, W, H, N, dc=4, roll=2)
    cfg = StreamConfig(width=W, height=H, qp=30, inter=True, bframes=True,
                       sao=True, sdh=True, weightp=True)
    s_np, recons = RefIntraEncoderV1(cfg).encode_video(frames, gop=6)
    enc = GopEncoder(cfg)
    s_dev = enc.encode_video_chunked(frames, gop=6, chunk=4)
    assert s_np == s_dev
    if avref.available():
        av = avref.decode_hevc(s_dev)
        assert len(av) == N
        for k, (d, r) in enumerate(zip(av, recons)):
            assert np.array_equal(d[0].astype(np.int32),
                                  r["y"][:H, :W]), k
