"""Tile conformance and tiled-encode correctness."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.frame_jax import JaxIntraEncoder, pick_tile_grid  # noqa: E402
from hevc_tpu.encoder.toplevel import VideoEncoder  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig, write_pps, write_sps, \
    write_vps  # noqa: E402
from hevc_tpu.utils.bitio import annexb  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def _content(W, H, seed=5):
    rng = np.random.default_rng(seed)
    y = np.clip(128 + rng.integers(-60, 60, (H, W)), 0, 255).astype(np.int32)
    cb = np.clip(128 + rng.integers(-25, 25, (H // 2, W // 2)), 0, 255).astype(np.int32)
    cr = np.clip(128 + rng.integers(-25, 25, (H // 2, W // 2)), 0, 255).astype(np.int32)
    return y, cb, cr


@pytest.mark.parametrize("tc,tr", [(2, 2), (4, 3), (1, 3), (8, 6)])
def test_tiled_self_decode(tc, tr):
    W, H = 128, 96
    y, cb, cr = _content(W, H)
    cfg = StreamConfig(width=W, height=H, qp=30, tile_cols=tc, tile_rows=tr, deblock=False)
    enc = VideoEncoder(cfg, backend="jax")
    nal, recon = enc.encode_frame(y, cb, cr)
    stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg), nal])
    f = decode_annexb(stream)[0]
    for k in ("y", "cb", "cr"):
        assert np.array_equal(f[k], recon[k]), k


@pytest.mark.skipif(not avref.available(), reason="avref unavailable")
@pytest.mark.parametrize("tc,tr", [(2, 2), (4, 3), (1, 3)])
def test_tiled_avcodec_bit_exact(tc, tr):
    W, H = 128, 96
    y, cb, cr = _content(W, H)
    cfg = StreamConfig(width=W, height=H, qp=27, tile_cols=tc, tile_rows=tr, deblock=False)
    enc = VideoEncoder(cfg, backend="jax")
    nal, recon = enc.encode_frame(y, cb, cr)
    stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg), nal])
    d = avref.decode_hevc(stream)
    assert d
    for a, k in zip(d[0], ("y", "cb", "cr")):
        assert np.array_equal(a.astype(np.int32), recon[k]), (tc, tr, k)


def test_tiled_equals_untiled_inside_tiles():
    """CTUs away from tile boundaries must code identically to untiled."""
    W, H = 128, 96
    y, cb, cr = _content(W, H)
    enc = JaxIntraEncoder(30)
    tiled = enc.encode_frames_tiled([(y, cb, cr)], 2, 2)[0]
    untiled = enc.encode_frame(y, cb, cr)
    # tile-interior CTU (not row 0/col 0 of any tile): e.g. (1,1)
    assert tiled["modes"][1, 1] == untiled["modes"][1, 1]


def test_pick_tile_grid():
    # 1080p: 120x68 CTUs
    tc, tr = pick_tile_grid(68, 120)
    assert 120 % tc == 0 and 68 % tr == 0
    assert (120 // tc) * 16 >= 256 and (68 // tr) * 16 >= 64
    # tiny frame: tiles off
    assert pick_tile_grid(3, 4) == (1, 1)
