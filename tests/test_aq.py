"""Per-CTB QP (cu_qp_delta) + variance AQ conformance.

The reference's x265 delegate always runs adaptive quantization
("AQ: mode 2 / str 1.0 / qg-size 32", bench log; core/transcoder.py:
398-412).  Here: PPS cu_qp_delta_enabled with QG = CTB, variance-based
per-CTB QP offsets, spec 7.3.8.10 delta signaling at the QG's first
coded TU, and 8.6.1 QP prediction (QG = CTB makes qPY_PRED the previous
QG's QP in decode order)."""
import numpy as np
import pytest

from hevc_tpu.decoder.decode import decode_annexb
from hevc_tpu.decoder.syntax import SliceSyntaxDecoder
from hevc_tpu.encoder.reference_encoder import RefIntraEncoder
from hevc_tpu.entropy.headers import StreamConfig
from hevc_tpu.entropy.syntax import SliceSyntaxEncoder
from hevc_tpu.utils.bitio import annexb
from hevc_tpu.validate import avref

needs_avref = pytest.mark.skipif(not avref.available(),
                                 reason="libavcodec harness unavailable")


def _mixed_content(W=96, H=80, seed=11):
    """Flat sky above, heavy texture below: forces a spread of per-CTB
    variances so AQ emits both negative and positive deltas."""
    rng = np.random.default_rng(seed)
    y = np.full((H, W), 120, np.int32)
    y[:H // 2] += (np.arange(W, dtype=np.int32) // 8)[None, :]
    y[H // 2:] = rng.integers(0, 256, (H - H // 2, W))
    cb = np.full((H // 2, W // 2), 128, np.int32)
    cr = np.full((H // 2, W // 2), 128, np.int32)
    cr[: H // 4] = 140
    return y, cb, cr


def _encode_aq(y, cb, cr, qp, strength=1.0):
    cfg = StreamConfig(width=y.shape[1], height=y.shape[0], qp=qp,
                       deblock=False, cu_qp_delta=True,
                       aq_strength=strength)
    enc = RefIntraEncoder(cfg)
    nal, recon = enc.encode_frame(y, cb, cr)
    return annexb(enc.parameter_sets() + [nal]), recon


def test_cu_qp_delta_syntax_roundtrip():
    deltas = [0, 1, -1, 2, 4, -4, 5, -5, 6, 11, -12, 26, -26, 0, 3]
    enc = SliceSyntaxEncoder(30)
    for d in deltas:
        enc.encode_cu_qp_delta(d)
    enc.encode_end_of_slice(True)
    dec = SliceSyntaxDecoder(enc.cabac.bytes_aligned(), 30)
    assert [dec.decode_cu_qp_delta() for _ in deltas] == deltas


def test_aq_self_decode_bit_exact():
    y, cb, cr = _mixed_content()
    stream, recon = _encode_aq(y, cb, cr, 32)
    f = decode_annexb(stream)[0]
    for k in ("y", "cb", "cr"):
        assert np.array_equal(f[k], recon[k]), k


def test_aq_emits_real_deltas():
    y, cb, cr = _mixed_content()
    s_aq, _ = _encode_aq(y, cb, cr, 32, strength=1.0)
    s_flat, _ = _encode_aq(y, cb, cr, 32, strength=0.0)
    assert s_aq != s_flat          # the QP map actually moved


@needs_avref
@pytest.mark.parametrize("qp", [22, 32, 45])
def test_avcodec_decodes_aq_stream_bit_exact(qp):
    y, cb, cr = _mixed_content()
    stream, recon = _encode_aq(y, cb, cr, qp)
    dy, dcb, dcr = avref.decode_hevc(stream)[0]
    for a, k in ((dy, "y"), (dcb, "cb"), (dcr, "cr")):
        assert np.array_equal(a.astype(np.int32),
                              recon[k][:a.shape[0], :a.shape[1]]), (qp, k)
