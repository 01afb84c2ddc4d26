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
