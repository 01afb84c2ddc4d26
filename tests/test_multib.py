"""Multi-B mini-GOPs (bframes_n=2, IbbPbbP): schedule, RPS sets, numpy
conformance, device==numpy parity (x265 `bframes` without the pyramid,
VERDICT r2 missing #4)."""
import numpy as np
import pytest


def _frames(rng, W, H, n):
    base = rng.integers(20, 170, (H, W), np.int32)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, i * 2, axis=1)
                    + rng.integers(-2, 3, (H, W)), 0, 255)
        cb = rng.integers(100, 140, (H // 2, W // 2))
        cr = np.full((H // 2, W // 2), 128, np.int32)
        out.append(tuple(p.astype(np.int32) for p in (y, cb, cr)))
    return out


def test_schedule_ibbp():
    from hevc_tpu.encoder.gop import b_schedule
    # I P3 b1 b2 P6 b4 b5 P7(trail)
    s = b_schedule(8, 0, True, 2)
    assert [e[0] for e in s] == [0, 3, 1, 2, 6, 4, 5, 7]
    assert [e[1] for e in s] == [0, 1, 2, 2, 1, 2, 2, 1]
    # rps sets: P@3 -> 0, b(1,2) -> 1, b(2,1) -> 3, trailing P@1 -> 2
    assert s[1][3] == 0 and s[2][3] == 1 and s[3][3] == 3
    assert s[7][3] == 2
    # nb=1 unchanged (IbPbP)
    s1 = b_schedule(5, 0, True, 1)
    assert [e[0] for e in s1] == [0, 2, 1, 4, 3]
    assert all(e[3] == 1 for e in s1 if e[1] == 2)


def test_schedule_covers_every_frame():
    from hevc_tpu.encoder.gop import b_schedule
    for nb in (1, 2):
        for gop in (0, 5, 7, 12):
            for n in range(1, 20):
                s = b_schedule(n, gop, True, nb)
                assert sorted(e[0] for e in s) == list(range(n)), \
                    (nb, gop, n)


def test_rps_sets_consistent_with_headers():
    from hevc_tpu.entropy.headers import StreamConfig, rps_sets
    cfg = StreamConfig(width=64, height=64, inter=True, bframes=True,
                       bframes_n=2)
    sets = rps_sets(cfg)
    assert len(sets) == 6
    assert sets[0] == ([3], []) and sets[1] == ([1], [2])
    assert sets[3] == ([2], [1]) and sets[5] == ([1], [1])
    assert cfg.rps_nbits() == 3
    cfg1 = StreamConfig(width=64, height=64, inter=True, bframes=True)
    assert len(rps_sets(cfg1)) == 3 and cfg1.rps_nbits() == 2


def test_numpy_multib_conformant():
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
    from hevc_tpu.decoder.decode import decode_annexb
    from hevc_tpu.validate import avref

    rng = np.random.default_rng(4)
    W, H, N = 96, 64, 10
    frames = _frames(rng, W, H, N)
    cfg = StreamConfig(width=W, height=H, qp=30, inter=True, bframes=True,
                       bframes_n=2, weightp=True, sdh=True)
    stream, recons = RefIntraEncoderV1(cfg).encode_video(frames, gop=7)
    dec = decode_annexb(stream)
    assert len(dec) == N
    for k, (d, r) in enumerate(zip(dec, recons)):
        assert np.array_equal(d["y"][:H, :W], r["y"][:H, :W]), k
    if avref.available():
        av = avref.decode_hevc(stream)
        assert len(av) == N
        for k, (d, r) in enumerate(zip(av, recons)):
            assert np.array_equal(d[0].astype(np.int32),
                                  r["y"][:H, :W]), k


@pytest.mark.slow
def test_chunked_multib_matches_numpy():
    """Production chunked device path with bframes_n=2 (+SAO+SDH+weightp)
    == numpy bytes, libavcodec decodes bit-exactly."""
    import jax  # noqa: F401
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
    from hevc_tpu.encoder.gop import GopEncoder
    from hevc_tpu.validate import avref

    rng = np.random.default_rng(4)
    W, H, N = 96, 64, 10
    frames = _frames(rng, W, H, N)
    cfg = StreamConfig(width=W, height=H, qp=30, inter=True, bframes=True,
                       bframes_n=2, weightp=True, sdh=True, sao=True)
    s_np, recons = RefIntraEncoderV1(cfg).encode_video(frames, gop=7)
    enc = GopEncoder(cfg)
    s_dev = enc.encode_video_chunked(frames, gop=7, chunk=4)
    assert s_np == s_dev
    if avref.available():
        av = avref.decode_hevc(s_dev)
        assert len(av) == N
        for k, (d, r) in enumerate(zip(av, recons)):
            assert np.array_equal(d[0].astype(np.int32),
                                  r["y"][:H, :W]), k
