"""CTB-32 two-level-quadtree profile: conformance + rate sanity.

The ctb32 numpy encoder (encoder/ctb32_ref.py) is the behavioral spec for
the device kernel; these tests pin its streams to both decoders.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from generate_test_videos import synth_frame_kind  # noqa: E402
from hevc_tpu.encoder.ctb32_ref import Ctb32RefEncoder, \
    make_ctb32_config  # noqa: E402
from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def _roundtrip(kind, bframes, W=96, H=64, QP=27, F=5):
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, kind))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=QP, inter=True,
                            bframes=bframes)
    enc = Ctb32RefEncoder(cfg)
    stream, recons = enc.encode_video(frames, gop=0)
    dec = decode_annexb(stream)
    assert len(dec) == F
    for d, r in zip(dec, recons):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(d[k], r[k]), k
    if avref.available():
        ref = avref.decode_hevc(stream)
        assert len(ref) == F
        for a, r in zip(ref, recons):
            assert np.array_equal(a[0].astype(np.int32), r["y"][:H, :W])
            assert np.array_equal(a[1].astype(np.int32),
                                  r["cb"][:H // 2, :W // 2])
            assert np.array_equal(a[2].astype(np.int32),
                                  r["cr"][:H // 2, :W // 2])
    return stream, recons


def test_ctb32_ippp_mixed():
    _roundtrip("mixed", bframes=False)


def test_ctb32_ibpbp_mixed():
    _roundtrip("mixed", bframes=True)


def test_ctb32_ibpbp_pan():
    _roundtrip("pan", bframes=True)


@pytest.mark.slow
def test_ctb32_detail_noise():
    _roundtrip("detail", bframes=True)
    _roundtrip("noise", bframes=False)


def test_ctb32_cpp_entropy_identity():
    """C++ ctb32 fast path must be byte-identical to the Python walk."""
    from hevc_tpu.entropy import binding
    if not binding.available() or \
            not hasattr(binding, "encode_tile_payload_ctb32"):
        pytest.skip("C++ entropy unavailable")
    import hevc_tpu.encoder.ctb32_ref as CR
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(96, 64, t, "mixed"))
              for t in range(4)]
    for bflag in (False, True):
        cfg = make_ctb32_config(width=96, height=64, qp=27, inter=True,
                                bframes=bflag)
        orig = CR.entropy_encode_frame_ctb32
        diffs = []

        def both(cfg2, dec, **kw):
            py = orig(cfg2, dec, use_cpp=False, **kw)
            cp = orig(cfg2, dec, use_cpp=True, **kw)
            diffs.append(py == cp)
            return py

        CR.entropy_encode_frame_ctb32 = both
        try:
            Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
        finally:
            CR.entropy_encode_frame_ctb32 = orig
        assert all(diffs), diffs


def test_ctb32_sao_roundtrip():
    """ctb32 + SAO (x265-medium always-on tool, VERDICT r2 item 3):
    I/P streams carry per-CTB32 SAO params, B slices code SAO-off; both
    decoders bit-exact."""
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(96, 64, t, "mixed"))
              for t in range(5)]
    for bf in (False, True):
        cfg = make_ctb32_config(width=96, height=64, qp=30, inter=True,
                                sao=True, sdh=True, bframes=bf)
        stream, recons = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
        dec = decode_annexb(stream)
        for d, r in zip(dec, recons):
            for k in ("y", "cb", "cr"):
                assert np.array_equal(d[k], r[k]), k
        if avref.available():
            ref = avref.decode_hevc(stream)
            assert len(ref) == 5
            for a, r in zip(ref, recons):
                assert np.array_equal(a[0].astype(np.int32),
                                      r["y"][:64, :96])


@pytest.mark.slow
def test_ctb32_sao_tiled():
    """SAO merge-availability flags are tile-local in the ctb32 walk."""
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(128, 64, t, "pan"))
              for t in range(4)]
    cfg = make_ctb32_config(width=128, height=64, qp=30, inter=True,
                            sao=True, tile_cols=2, tile_rows=1)
    stream, recons = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    dec = decode_annexb(stream)
    for d, r in zip(dec, recons):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(d[k], r[k]), k
    if avref.available():
        ref = avref.decode_hevc(stream)
        for a, r in zip(ref, recons):
            assert np.array_equal(a[0].astype(np.int32), r["y"][:64, :128])


def test_ctb32_multib_conformant():
    """ctb32 multi-B mini-GOPs (bframes_n=2, IbbPbbP): schedule-driven
    RPS sets, per-picture cross-list scaling; both decoders bit-exact."""
    W, H, F = 96, 64, 8
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, "mixed"))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=30, inter=True,
                            bframes=True, bframes_n=2, sdh=True, sao=True,
                            weightp=True)
    stream, recons = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    dec = decode_annexb(stream)
    assert len(dec) == F
    for d, r in zip(dec, recons):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(d[k], r[k]), k
    if avref.available():
        ref = avref.decode_hevc(stream)
        assert len(ref) == F
        for a, r in zip(ref, recons):
            assert np.array_equal(a[0].astype(np.int32), r["y"][:H, :W])


@pytest.mark.slow
def test_ctb32_prod_multib_matches_numpy():
    """Production driver at bframes_n=2 with the full toolset
    (SAO/SDH/weightp) == numpy spec byte-for-byte."""
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder
    W, H, F = 64, 64, 8
    frames = _fade_frames(W, H, F, kind="mixed")
    cfg = make_ctb32_config(width=W, height=H, qp=30, inter=True,
                            bframes=True, bframes_n=2, sdh=True, sao=True,
                            weightp=True)
    sn, _ = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd = Ctb32GopEncoder(cfg).encode_video(frames, gop=0)
    assert sn == sd


def test_ctb32_uses_both_levels():
    """The encoder must actually exercise split and unsplit CTBs."""
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(128, 96, t, "mixed"))
              for t in range(3)]
    cfg = make_ctb32_config(width=128, height=96, qp=27, inter=True)
    enc = Ctb32RefEncoder(cfg)
    dec_i, _ = enc.encode_frame_i(*frames[0])
    s = dec_i["split32"]
    assert s.any() and not s.all(), "expected a mix of 32 and 16 CUs"


@pytest.mark.slow
def test_ctb32_device_matches_numpy_ippp():
    """The ctb32 device kernel must emit byte-identical streams to the
    numpy spec (compile-heavy on CPU; the TPU path runs the same graph)."""
    from hevc_tpu.encoder.gop32 import Ctb32DeviceEncoder
    W, H, QP, F = 64, 64, 27, 3
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, "mixed"))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=QP, inter=True)
    sn, rn = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd, rd = Ctb32DeviceEncoder(cfg).encode_video(frames, gop=0)
    assert sn == sd
    for a, b in zip(rn, rd):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(a[k], b[k])


@pytest.mark.slow
def test_ctb32_device_matches_numpy_ibpbp():
    """ctb32 device B kernel (two ref lists, bi-pred, 32/16 quadtree)
    byte-identical to the numpy spec across a whole IbPbP stream."""
    from hevc_tpu.encoder.gop32 import Ctb32DeviceEncoder
    W, H, QP, F = 64, 64, 27, 5
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, "mixed"))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=QP, inter=True,
                            bframes=True)
    sn, rn = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd, rd = Ctb32DeviceEncoder(cfg).encode_video(frames, gop=0)
    assert sn == sd
    for a, b in zip(rn, rd):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(a[k], b[k])


@pytest.mark.slow
def test_ctb32_prod_matches_numpy_ibpbp():
    """Production fused-dispatch driver (device packing, entropy worker
    thread) must equal the numpy spec byte-for-byte on an IbPbP + SDH
    stream — the exact ctb32-preset configuration."""
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder
    W, H, QP, F = 64, 64, 27, 5
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, "mixed"))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=QP, inter=True,
                            bframes=True, sdh=True)
    sn, _ = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd = Ctb32GopEncoder(cfg).encode_video(frames, gop=0)
    assert sn == sd


def _fade_frames(W, H, F, kind="pan"):
    base = [tuple(np.asarray(p, np.int32)
                  for p in synth_frame_kind(W, H, t, kind))
            for t in range(F)]

    def fade(f, t):
        g = 1.0 - 0.12 * t
        return tuple(np.clip((p.astype(np.float64) * g).round(), 0,
                             255).astype(np.int32) for p in f)
    return [fade(f, t) for t, f in enumerate(base)]


def test_ctb32_weightp_conformant_and_saves_bits():
    """ctb32 + explicit weighted P prediction (x265-medium `weightp`):
    fade content must decode bit-exactly in both decoders and cost
    clearly fewer bits than the unweighted toolset (measured -46% IPPP /
    -33% IbPbP on this clip)."""
    W, H, F = 96, 64, 5
    frames = _fade_frames(W, H, F)
    for bf in (False, True):
        sizes = {}
        for wf in (False, True):
            cfg = make_ctb32_config(width=W, height=H, qp=30, inter=True,
                                    weightp=wf, sdh=True, bframes=bf)
            stream, recons = Ctb32RefEncoder(cfg).encode_video(frames,
                                                               gop=0)
            dec = decode_annexb(stream)
            for d, r in zip(dec, recons):
                for k in ("y", "cb", "cr"):
                    assert np.array_equal(d[k], r[k]), (bf, wf, k)
            if avref.available():
                ref = avref.decode_hevc(stream)
                assert len(ref) == F
                for a, r in zip(ref, recons):
                    assert np.array_equal(a[0].astype(np.int32),
                                          r["y"][:H, :W]), (bf, wf)
            sizes[wf] = len(stream)
        assert sizes[True] < 0.85 * sizes[False], (bf, sizes)


@pytest.mark.slow
def test_ctb32_prod_weightp_matches_numpy():
    """Production fused-dispatch driver with weightp (and SAO/SDH — the
    full ctb32-preset toolset) must equal the numpy spec byte-for-byte
    on a fade IbPbP stream."""
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder
    W, H, F = 64, 64, 5
    frames = _fade_frames(W, H, F, kind="mixed")
    cfg = make_ctb32_config(width=W, height=H, qp=30, inter=True,
                            bframes=True, sdh=True, sao=True, weightp=True)
    sn, rn = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd = Ctb32GopEncoder(cfg).encode_video(frames, gop=0)
    assert sn == sd
    if avref.available():
        ref = avref.decode_hevc(sd)
        assert len(ref) == F
        for a, r in zip(ref, rn):
            assert np.array_equal(a[0].astype(np.int32), r["y"][:H, :W])


@pytest.mark.slow
def test_ctb32_device_weightp_matches_numpy():
    """Per-frame device driver with weightp == numpy spec (IPPP fade)."""
    from hevc_tpu.encoder.gop32 import Ctb32DeviceEncoder
    W, H, F = 64, 64, 4
    frames = _fade_frames(W, H, F, kind="mixed")
    cfg = make_ctb32_config(width=W, height=H, qp=27, inter=True,
                            weightp=True, sdh=True)
    sn, rn = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd, rd = Ctb32DeviceEncoder(cfg).encode_video(frames, gop=0)
    assert sn == sd
    for a, b in zip(rn, rd):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(a[k], b[k])


@pytest.mark.slow
def test_ctb32_prod_sao_matches_numpy():
    """Chunked production driver with SAO: in-dispatch estimate+apply at
    CTB-32 granularity, SAO'd DPB feedback, packed per-CTB params — must
    equal the numpy spec byte-for-byte and decode bit-exactly (the
    ctb32-preset production configuration with x265-medium's always-on
    SAO)."""
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder
    W, H, QP, F = 64, 64, 30, 5
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, "mixed"))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=QP, inter=True,
                            bframes=True, sdh=True, sao=True)
    sn, rn = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd = Ctb32GopEncoder(cfg).encode_video(frames, gop=0)
    assert sn == sd
    dec = decode_annexb(sd)
    for d, r in zip(dec, rn):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(d[k], r[k]), k
    if avref.available():
        ref = avref.decode_hevc(sd)
        assert len(ref) == F
        for a, r in zip(ref, rn):
            assert np.array_equal(a[0].astype(np.int32), r["y"][:H, :W])


@pytest.mark.slow
def test_ctb32_preset_convert(tmp_path):
    """convert_video with the ctb32 preset: SUCCESS, decodable mp4 with
    B pictures (ctts present), frame count preserved."""
    from generate_test_videos import generate_clip
    from hevc_tpu.batch.transcode import convert_video
    from hevc_tpu.io.probe import probe_media
    src = generate_clip(tmp_path / "in" / "clip.y4m", 64, 48, 6)
    res = convert_video(src, tmp_path / "out", preset="ctb32")
    assert res["status"] == "SUCCESS", res
    out = tmp_path / "out" / "clip.mp4"
    info = probe_media(out)
    assert info.codec_name == "hevc"
    assert info.nb_frames == 6
    assert b"ctts" in out.read_bytes()


@pytest.mark.slow
def test_ctb32_saves_bits_vs_ctb16():
    """Where CU-header signaling dominates (smooth content, higher QP),
    the 32-level toolset must clearly beat CTB-16 at equal QP (VERDICT
    r2: flat regions pay ~16x CTU-header cost at CTB16; measured -39%
    at QP42 on smooth pan, -5% at QP37, ~par at QP32 on this tiny clip
    where residual bits dominate)."""
    from generate_test_videos import _texture
    from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
    from hevc_tpu.entropy.headers import StreamConfig
    W, H, QP, F = 192, 128, 40, 5
    tex = _texture(W + 200, H + 40, 3, detail=0.2)

    def fr(t):
        yv = tex[8 + 2 * t:8 + 2 * t + H, 16 + 9 * t:16 + 9 * t + W]
        to8 = lambda a: np.clip(np.round(a), 16, 235).astype(np.int32)  # noqa: E731
        return to8(yv), to8(118 + yv[::2, ::2] / 16), \
            to8(138 - yv[1::2, ::2] / 16)

    frames = [fr(t) for t in range(F)]
    cfg32 = make_ctb32_config(width=W, height=H, qp=QP, inter=True,
                              bframes=True)
    s32, _ = Ctb32RefEncoder(cfg32).encode_video(frames, gop=0)
    cfg16 = StreamConfig(width=W, height=H, qp=QP, inter=True, bframes=True)
    s16, _ = RefIntraEncoderV1(cfg16, enable_nxn=False).encode_video(
        frames, gop=0)
    assert len(s32) < 0.9 * len(s16), (len(s32), len(s16))
