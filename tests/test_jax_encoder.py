"""The JAX wavefront encoder must replicate the scalar reference encoder
bit-exactly (decisions, levels, reconstruction, and therefore bitstreams)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.encoder.frame_jax import JaxIntraEncoder  # noqa: E402
from hevc_tpu.encoder.reference_encoder import RefIntraEncoder  # noqa: E402
from hevc_tpu.encoder.toplevel import VideoEncoder, entropy_encode_frame  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig  # noqa: E402


def _content(seed=7, W=64, H=48):
    rng = np.random.default_rng(seed)
    y = np.clip((np.arange(W) * 2 + np.arange(H)[:, None] * 1.5).astype(np.int32)
                % 256 + rng.integers(-6, 7, (H, W)), 0, 255)
    cb = np.clip(128 + rng.integers(-25, 25, (H // 2, W // 2)), 0, 255)
    cr = np.clip(128 + rng.integers(-25, 25, (H // 2, W // 2)), 0, 255)
    return y.astype(np.int32), cb.astype(np.int32), cr.astype(np.int32)


@pytest.mark.parametrize("qp", [17, 27, 40])
def test_jax_matches_reference_recon(qp):
    y, cb, cr = _content()
    jres = JaxIntraEncoder(qp).encode_frame(y, cb, cr)
    cfg = StreamConfig(width=64, height=48, qp=qp)
    _, recon = RefIntraEncoder(cfg).encode_frame(y, cb, cr)
    for k in ("y", "cb", "cr"):
        assert np.array_equal(jres["recon"][k], recon[k]), k


def test_jax_bitstream_identical_to_reference():
    y, cb, cr = _content(3)
    cfg = StreamConfig(width=64, height=48, qp=27)
    nal_jax, _ = VideoEncoder(cfg, backend="jax").encode_frame(y, cb, cr)
    nal_ref, _ = VideoEncoder(cfg, backend="reference").encode_frame(y, cb, cr)
    assert nal_jax == nal_ref


def test_batched_equals_single():
    rng = np.random.default_rng(1)
    frames = [tuple(np.clip(128 + rng.integers(-60, 60, s), 0, 255).astype(np.int32)
                    for s in ((48, 64), (24, 32), (24, 32))) for _ in range(3)]
    enc = JaxIntraEncoder(30)
    singles = [enc.encode_frame(*f) for f in frames]
    batched = enc.encode_frames(frames)
    for s, b in zip(singles, batched):
        for k in ("modes", "cbf_y", "cbf_cb", "cbf_cr",
                  "lvl_y", "lvl_cb", "lvl_cr"):
            assert np.array_equal(s[k], b[k]), k
        for k in ("y", "cb", "cr"):
            assert np.array_equal(s["recon"][k], b["recon"][k]), k


def test_cpp_entropy_identical_to_python():
    from hevc_tpu.entropy import binding
    if not binding.available():
        pytest.skip("C++ entropy unavailable")
    y, cb, cr = _content(11)
    res = JaxIntraEncoder(24).encode_frame(y, cb, cr)
    cfg = StreamConfig(width=64, height=48, qp=24)
    nal_py = entropy_encode_frame(cfg, res)
    # rebuild via C++ payload
    from hevc_tpu.entropy.headers import write_slice_header_idr
    from hevc_tpu.utils.bitio import make_nal, NAL_IDR_W_RADL
    payload = binding.encode_slice_payload_v0(24, res)
    nal_cpp = make_nal(NAL_IDR_W_RADL,
                       write_slice_header_idr(cfg).bytes() + payload)
    assert nal_py == nal_cpp
