"""Bitstream conformance: every stream we emit must decode bit-exactly in an
independent decoder (libavcodec), and our conformance decoder must decode
independent encoders' streams (libx265) bit-exactly."""
import numpy as np
import pytest

from hevc_tpu.decoder.decode import decode_annexb
from hevc_tpu.encoder.reference_encoder import RefIntraEncoder
from hevc_tpu.entropy.headers import StreamConfig
from hevc_tpu.utils.bitio import annexb
from hevc_tpu.validate import avref

needs_avref = pytest.mark.skipif(not avref.available(),
                                 reason="libavcodec harness unavailable")


def _content(seed=7, W=64, H=48):
    rng = np.random.default_rng(seed)
    y = np.clip((np.arange(W) * 2 + np.arange(H)[:, None] * 1.5).astype(np.int32)
                % 256 + rng.integers(-5, 6, (H, W)), 0, 255)
    y[16:32, 16:48] = 200
    cb = np.full((H // 2, W // 2), 128, np.int32)
    cb[:10, :10] = 90
    cr = np.full((H // 2, W // 2), 128, np.int32)
    cr[5:15, 8:20] = 160
    return y, cb, cr


def _encode(y, cb, cr, qp):
    # deblock off: these tests assert decoder == encoder reconstruction
    cfg = StreamConfig(width=y.shape[1], height=y.shape[0], qp=qp,
                       deblock=False)
    enc = RefIntraEncoder(cfg)
    nal, recon = enc.encode_frame(y, cb, cr)
    return annexb(enc.parameter_sets() + [nal]), recon


def test_self_decode_bit_exact():
    y, cb, cr = _content()
    stream, recon = _encode(y, cb, cr, 27)
    f = decode_annexb(stream)[0]
    for k in ("y", "cb", "cr"):
        assert np.array_equal(f[k], recon[k]), k


@needs_avref
@pytest.mark.parametrize("qp", [10, 17, 22, 27, 32, 37, 45, 51])
def test_avcodec_decodes_our_stream_bit_exact(qp):
    y, cb, cr = _content()
    stream, recon = _encode(y, cb, cr, qp)
    dy, dcb, dcr = avref.decode_hevc(stream)[0]
    for a, k in ((dy, "y"), (dcb, "cb"), (dcr, "cr")):
        assert np.array_equal(a.astype(np.int32),
                              recon[k][:a.shape[0], :a.shape[1]]), (qp, k)


@needs_avref
def test_avcodec_decodes_noise_stream():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (48, 64)).astype(np.int32)
    cb = rng.integers(0, 256, (24, 32)).astype(np.int32)
    cr = rng.integers(0, 256, (24, 32)).astype(np.int32)
    for qp in (18, 34):
        stream, recon = _encode(y, cb, cr, qp)
        dy, dcb, dcr = avref.decode_hevc(stream)[0]
        for a, k in ((dy, "y"), (dcb, "cb"), (dcr, "cr")):
            assert np.array_equal(a.astype(np.int32), recon[k]), (qp, k)


@needs_avref
def test_nonaligned_dimensions_crop():
    """Picture sizes not multiple of CTB: padded + conformance window."""
    y, cb, cr = _content(W=60, H=36)
    stream, recon = _encode(y, cb, cr, 30)
    dy, dcb, dcr = avref.decode_hevc(stream)[0]
    assert dy.shape == (36, 60)
    assert np.array_equal(dy.astype(np.int32), recon["y"][:36, :60])
    assert np.array_equal(dcb.astype(np.int32), recon["cb"][:18, :30])


X265_PARAMS = ("ctu=16:min-cu-size=16:max-tu-size=16:tu-intra-depth=1:"
               "no-sao=1:no-deblock=1:no-signhide=1:rdoq-level=0:"
               "no-strong-intra-smoothing=1:keyint=1:bframes=0:no-wpp=1:"
               "frame-threads=1:no-scenecut=1:no-cutree=1:aq-mode=0:qp=27:"
               "no-tskip=1:annexb=1:repeat-headers=1")


@needs_avref
def test_our_decoder_decodes_x265_bit_exact():
    rng = np.random.default_rng(1)
    y = np.clip(128 + rng.integers(-40, 40, (48, 64)), 0, 255).astype(np.uint8)
    cb = np.clip(128 + rng.integers(-20, 20, (24, 32)), 0, 255).astype(np.uint8)
    cr = np.clip(128 + rng.integers(-20, 20, (24, 32)), 0, 255).astype(np.uint8)
    bs = avref.encode([(y, cb, cr)], "libx265", crf=27,
                      opts=f"x265-params={X265_PARAMS}")
    ref = avref.decode_hevc(bs)[0]
    mine = decode_annexb(bs)[0]
    for a, k in zip(ref, ("y", "cb", "cr")):
        assert np.array_equal(a.astype(np.int32), mine[k]), k
