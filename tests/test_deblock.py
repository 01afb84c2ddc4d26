"""Deblocking filter conformance (spec 8.7.2, v0 profile edges)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.toplevel import VideoEncoder  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig, write_pps, write_sps, \
    write_vps  # noqa: E402
from hevc_tpu.utils.bitio import annexb  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def _smooth(W=128, H=96):
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    y = np.clip(80 + 40 * np.sin(xx / 17) + 50 * np.cos(yy / 23) + (xx + yy) / 3,
                0, 255).astype(np.int32)
    cb = np.clip(128 + 30 * np.sin(xx[::2, ::2] / 9), 0, 255).astype(np.int32)
    cr = np.clip(128 + 30 * np.cos(yy[::2, ::2] / 7), 0, 255).astype(np.int32)
    return y, cb, cr


@pytest.mark.skipif(not avref.available(), reason="avref unavailable")
@pytest.mark.parametrize("qp,tiles", [(30, (1, 1)), (38, (2, 2)), (45, (4, 3))])
def test_deblock_bit_exact_vs_avcodec(qp, tiles):
    y, cb, cr = _smooth()
    cfg = StreamConfig(width=128, height=96, qp=qp, tile_cols=tiles[0],
                       tile_rows=tiles[1], deblock=True)
    enc = VideoEncoder(cfg, backend="jax")
    nal, recon = enc.encode_frame(y, cb, cr)
    stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg), nal])
    ours = decode_annexb(stream)[0]
    ref = avref.decode_hevc(stream)[0]
    for a, k in zip(ref, ("y", "cb", "cr")):
        assert np.array_equal(a.astype(np.int32), ours[k]), (qp, tiles, k)
    # the filter actually fired
    assert (ours["y"] != recon["y"]).sum() > 0


def test_deblock_tables():
    from hevc_tpu.ops.deblock import BETA_TABLE, TC_TABLE
    assert len(BETA_TABLE) == 52 and len(TC_TABLE) == 54
    assert BETA_TABLE[15] == 0 and BETA_TABLE[16] == 6 and BETA_TABLE[51] == 64
    assert TC_TABLE[17] == 0 and TC_TABLE[18] == 1 and TC_TABLE[53] == 24


def test_deblock_improves_psnr():
    y, cb, cr = _smooth()
    cfg = StreamConfig(width=128, height=96, qp=40, deblock=True)
    enc = VideoEncoder(cfg, backend="jax")
    nal, recon = enc.encode_frame(y, cb, cr)
    stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg), nal])
    filt = decode_annexb(stream)[0]

    def psnr(img):
        return 10 * np.log10(255**2 / max(np.mean((img.astype(float) - y)**2),
                                          1e-9))
    assert psnr(filt["y"]) > psnr(recon["y"])
