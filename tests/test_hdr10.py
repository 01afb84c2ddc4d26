"""Main10 / 10-bit / HDR10 path (BASELINE config 3)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.reference_encoder import RefIntraEncoder  # noqa: E402
from hevc_tpu.encoder.rowscan_jax import RowScanEncoder  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig, write_pps, write_sps, \
    write_vps  # noqa: E402
from hevc_tpu.entropy.tiled import entropy_encode_frame_tiled  # noqa: E402
from hevc_tpu.utils.bitio import annexb  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def _content10(W=128, H=96, seed=9):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    y = np.clip(300 + 400 * np.sin(xx / 25) + 200 * np.cos(yy / 20)
                + rng.integers(-12, 13, (H, W)), 0, 1023).astype(np.int32)
    cb = np.clip(512 + 120 * np.sin(xx[::2, ::2] / 11), 0, 1023).astype(np.int32)
    cr = np.clip(512 + 120 * np.cos(yy[::2, ::2] / 13), 0, 1023).astype(np.int32)
    return y, cb, cr


def test_10bit_jax_matches_reference():
    y, cb, cr = _content10()
    cfg = StreamConfig(width=128, height=96, qp=30, bit_depth=10,
                       profile_idc=2, deblock=False)
    nal_ref, recon = RefIntraEncoder(cfg).encode_frame(y, cb, cr)
    res = RowScanEncoder(30, bit_depth=10).encode_frames_tiled(
        [(y, cb, cr)], 1, 1)[0]
    for k in ("y", "cb", "cr"):
        assert np.array_equal(res["recon"][k], recon[k]), k
    assert entropy_encode_frame_tiled(cfg, res) == nal_ref


@pytest.mark.skipif(not avref.available(), reason="avref unavailable")
@pytest.mark.parametrize("deblock", [False, True])
def test_10bit_hdr_avcodec_bit_exact(deblock):
    y, cb, cr = _content10()
    cfg = StreamConfig(width=128, height=96, qp=30, bit_depth=10,
                       profile_idc=2, tile_cols=2, tile_rows=2,
                       deblock=deblock, color_primaries="bt2020",
                       color_transfer="smpte2084", color_space="bt2020nc",
                       hdr=True)
    res = RowScanEncoder(30, bit_depth=10).encode_frames_tiled(
        [(y, cb, cr)], 2, 2)[0]
    nal = entropy_encode_frame_tiled(cfg, res)
    stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg), nal])
    ours = decode_annexb(stream)[0]
    ref = avref.decode_hevc(stream)[0]
    assert ref[0].dtype == np.uint16
    for a, k in zip(ref, ("y", "cb", "cr")):
        assert np.array_equal(a.astype(np.int32), ours[k]), k


def test_pixfmt_pq_roundtrip():
    import jax.numpy as jnp
    from hevc_tpu.ops.pixfmt import pq_encode, pq_decode
    x = jnp.asarray([0.1, 1.0, 100.0, 1000.0, 10000.0])
    sig = pq_encode(x)
    back = pq_decode(sig)
    assert np.allclose(np.asarray(back), np.asarray(x), rtol=1e-3)


def test_sdr_to_hdr10_shapes():
    from hevc_tpu.ops.pixfmt import sdr8_to_hdr10
    rng = np.random.default_rng(0)
    y = rng.integers(16, 236, (64, 96)).astype(np.int32)
    cb = rng.integers(16, 241, (32, 48)).astype(np.int32)
    cr = rng.integers(16, 241, (32, 48)).astype(np.int32)
    y10, cb10, cr10 = sdr8_to_hdr10(y, cb, cr)
    assert y10.shape == (64, 96) and cb10.shape == (32, 48)
    assert int(np.asarray(y10).max()) <= 1023
