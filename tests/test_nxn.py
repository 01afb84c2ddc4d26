"""v1 profile (PART_NxN) parity and conformance."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1  # noqa: E402
from hevc_tpu.encoder.rowscan_v1 import RowScanEncoderV1  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig, write_pps, write_sps, \
    write_vps  # noqa: E402
from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1  # noqa: E402
from hevc_tpu.utils.bitio import annexb  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def _content(W=128, H=96, seed=5):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    y = np.clip(80 + 60 * np.sin(xx / 15) + 50 * np.cos(yy / 19),
                0, 255).astype(np.int32)
    y[30:70, 40:100] = np.clip(128 + rng.integers(-90, 90, (40, 60)), 0, 255)
    cb = np.clip(128 + 40 * np.sin(xx[::2, ::2] / 9), 0, 255).astype(np.int32)
    cr = np.clip(128 + rng.integers(-50, 50, (H // 2, W // 2)),
                 0, 255).astype(np.int32)
    return y, cb, cr


@pytest.mark.parametrize("tc,tr,qp", [(1, 1, 30), (2, 2, 22)])
def test_device_v1_matches_reference(tc, tr, qp):
    y, cb, cr = _content()
    cfg = StreamConfig(width=128, height=96, qp=qp, tile_cols=tc,
                       tile_rows=tr, deblock=False)
    nal_ref, recon_ref = RefIntraEncoderV1(cfg).encode_frame(y, cb, cr)
    dev = RowScanEncoderV1(qp).encode_frames_tiled([(y, cb, cr)], tc, tr)[0]
    for k in ("y", "cb", "cr"):
        assert np.array_equal(dev["recon"][k], recon_ref[k]), k
    assert entropy_encode_frame_v1(cfg, dev) == nal_ref
    assert dev["part_nxn"].sum() > 0      # NxN actually used


def test_cpp_v1_entropy_identical():
    from hevc_tpu.entropy import binding
    if not binding.available():
        pytest.skip("cpp entropy unavailable")
    y, cb, cr = _content(seed=3)
    cfg = StreamConfig(width=128, height=96, qp=27, tile_cols=2, tile_rows=2)
    dev = RowScanEncoderV1(27).encode_frames_tiled([(y, cb, cr)], 2, 2)[0]
    assert entropy_encode_frame_v1(cfg, dev, use_cpp=True) == \
        entropy_encode_frame_v1(cfg, dev, use_cpp=False)


@pytest.mark.skipif(not avref.available(), reason="avref unavailable")
@pytest.mark.parametrize("deblock", [False, True])
def test_v1_avcodec_bit_exact(deblock):
    y, cb, cr = _content()
    cfg = StreamConfig(width=128, height=96, qp=30, tile_cols=2, tile_rows=2,
                       deblock=deblock)
    dev = RowScanEncoderV1(30).encode_frames_tiled([(y, cb, cr)], 2, 2)[0]
    nal = entropy_encode_frame_v1(cfg, dev)
    stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg), nal])
    ours = decode_annexb(stream)[0]
    ref = avref.decode_hevc(stream)[0]
    for a, k in zip(ref, ("y", "cb", "cr")):
        assert np.array_equal(a.astype(np.int32), ours[k]), (deblock, k)


def test_v1_quality_beats_v0():
    from hevc_tpu.encoder.reference_encoder import RefIntraEncoder
    y, cb, cr = _content()
    cfg = StreamConfig(width=128, height=96, qp=30, deblock=False)
    n0, r0 = RefIntraEncoder(cfg).encode_frame(y, cb, cr)
    n1, r1 = RefIntraEncoderV1(cfg).encode_frame(y, cb, cr)

    def psnr(rec):
        return 10 * np.log10(255**2 / np.mean((rec["y"].astype(float) - y)**2))
    # v1 must dominate: better quality at no more bits (on this content)
    assert psnr(r1) > psnr(r0)
    assert len(n1) <= len(n0) * 1.02
