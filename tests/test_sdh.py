"""Sign-data hiding (SDH): quantizer fix-up + entropy sign omission.

x265-medium always runs `signhide` (the reference delegates to it at
core/transcoder.py:398-412; its bench log prints "signhide"), so the
TPU encoder carries SDH as a StreamConfig toolset flag.  The encoder's
parity fix-up (ops/reference.sdh_fixup, mirrored on device by
ops/jax_ops.sdh_fixup) guarantees the decoder's inferred sign matches;
the CABAC stage then omits one sign bypass bin per eligible 4x4
sub-block.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, str(Path(__file__).parent))

from hevc_tpu.decoder.decode import decode_annexb  # noqa: E402
from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1  # noqa: E402
from hevc_tpu.entropy.headers import StreamConfig  # noqa: E402
from hevc_tpu.entropy import tables as T  # noqa: E402
from hevc_tpu.ops import reference as R  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402
from test_pframes import _pan_sequence, _avref_exact  # noqa: E402

needs_avref = pytest.mark.skipif(not avref.available(),
                                 reason="libavcodec harness unavailable")


# ---- fix-up kernel properties ---------------------------------------------

def _rand_levels(rng, n, density=0.4, qp=30):
    lvl = rng.integers(-40, 41, (n, n)).astype(np.int32)
    mask = rng.random((n, n)) < density
    lvl = np.where(mask, lvl, 0)
    # plausible pre-quant coefficients: recon scale + sub-step noise
    coef = R.dequantize(lvl, qp) + rng.integers(-60, 61, (n, n))
    return lvl, coef.astype(np.int32)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("scan", [0, 1, 2])
def test_sdh_fixup_parity_property(n, scan):
    """After the fix-up every eligible sub-block's |level| sum parity
    encodes the firstSigScanPos sign (the decoder's inference rule)."""
    if n > 8 and scan > 0:
        pytest.skip("mode-dependent scans only reach log2 sizes 2-3")
    rng = np.random.default_rng(n * 10 + scan)
    sc = T.scan_order(scan, n)
    for _ in range(50):
        lvl, coef = _rand_levels(rng, n)
        out = R.sdh_fixup(lvl, coef, 30, scan)
        vals = out[sc[:, 1], sc[:, 0]]
        vin = lvl[sc[:, 1], sc[:, 0]]
        for sb in range(n * n // 16):
            sub = vals[sb * 16:(sb + 1) * 16]
            sin = vin[sb * 16:(sb + 1) * 16]
            nz = np.nonzero(sub)[0]
            nzi = np.nonzero(sin)[0]
            if nzi.size == 0 or nzi[-1] - nzi[0] <= 3:
                assert np.array_equal(sub, sin)   # ineligible: untouched
                continue
            # zeros never become significant; first/last never move
            assert np.all(sin[sub != sin] != 0)
            assert nz[0] == nzi[0] and nz[-1] == nzi[-1]
            assert (np.sum(np.abs(sub)) & 1) == int(sub[nz[0]] < 0)


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_sdh_fixup_device_matches_numpy(n):
    from hevc_tpu.ops import jax_ops as J
    rng = np.random.default_rng(n)
    qp = 30
    pairs = [_rand_levels(rng, n, d, qp) for d in (0.1, 0.4, 0.9, 1.0)]
    batch = np.stack([p[0] for p in pairs])
    coefs = np.stack([p[1] for p in pairs])
    jb, jc = jax.numpy.asarray(batch), jax.numpy.asarray(coefs)
    for scan in range(3):
        if n > 8 and scan > 0:
            continue
        want = np.stack([R.sdh_fixup(b, c, qp, scan)
                         for b, c in zip(batch, coefs)])
        got = np.asarray(J.sdh_fixup(jb, jc, qp, n, scan))
        assert np.array_equal(got, want), (n, scan)
    # traced per-batch scan selection (NxN mode-dependent scans are data)
    if n <= 8:
        sel = np.array([0, 1, 2, 0], np.int32)
        want = np.stack([R.sdh_fixup(b, c, qp, int(s))
                         for b, c, s in zip(batch, coefs, sel)])
        got = np.asarray(J.sdh_fixup(jb, jc, qp, n,
                                     jax.numpy.asarray(sel)))
        assert np.array_equal(got, want), n


# ---- stream conformance ---------------------------------------------------

def _run(frames, cfg, gop=0):
    enc = RefIntraEncoderV1(cfg)
    stream, recons = enc.encode_video(frames, gop=gop)
    dec = decode_annexb(stream)
    assert len(dec) == len(frames)
    for i, f in enumerate(dec):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(f[k], recons[i][k]), (i, k)
    return stream, recons


@needs_avref
@pytest.mark.parametrize("qp,bframes,nxn", [
    (27, False, True),
    (31, True, False),
    (20, True, True),
])
def test_sdh_conformance(qp, bframes, nxn, tmp_path):
    frames = _pan_sequence(W=96, H=64, F=6, step=(2, 3))
    cfg = StreamConfig(width=96, height=64, qp=qp, inter=True,
                       bframes=bframes, sdh=True)
    enc_kw = {}
    stream, recons = _run(frames, cfg)
    assert _avref_exact(stream, recons, tmp_path)


@needs_avref
def test_sdh_saves_bits(tmp_path):
    """SDH must shrink the stream at equal reconstruction quality class."""
    frames = _pan_sequence(W=96, H=64, F=6, step=(2, 3))
    base = StreamConfig(width=96, height=64, qp=24, inter=True)
    on = StreamConfig(width=96, height=64, qp=24, inter=True, sdh=True)
    s0, _ = RefIntraEncoderV1(base).encode_video(frames)
    s1, r1 = _run(frames, on)
    assert _avref_exact(s1, r1, tmp_path)
    assert len(s1) < len(s0)


def test_sdh_cpp_entropy_identical():
    """C++ entropy with sdh must be byte-identical to Python."""
    from hevc_tpu.entropy import binding
    from hevc_tpu.entropy.tiled_v1 import encode_tile_payload_v1, \
        _arrays_to_ctus
    if not binding.available():
        pytest.skip("C++ entropy unavailable")
    rng = np.random.default_rng(11)
    nh, nw = 3, 4
    d = {
        "part_nxn": rng.random((nh, nw)) < 0.5,
        "modes4": rng.integers(0, 35, (nh, nw, 4), np.int32),
        "cbf_y4": np.ones((nh, nw, 4), np.uint8),
        "cbf_cb4": np.ones((nh, nw, 4), np.uint8),
        "cbf_cr4": np.ones((nh, nw, 4), np.uint8),
        "cbf_cb": np.ones((nh, nw), np.uint8),
        "cbf_cr": np.ones((nh, nw), np.uint8),
        "lvl_y": rng.integers(-30, 31, (nh, nw, 16, 16), np.int16),
        "lvl_cb": rng.integers(-9, 10, (nh, nw, 8, 8), np.int16),
        "lvl_cr": rng.integers(-9, 10, (nh, nw, 8, 8), np.int16),
    }
    for a, v in (("lvl_y", 3), ("lvl_cb", 2), ("lvl_cr", 2)):
        d[a][..., 0, 0] = v
    # the entropy stage asserts the parity invariant, so feed it levels
    # that went through the fix-up with the TB's actual entropy scan
    def fx(lvl, scan):
        lvl = lvl.astype(np.int32)
        coef = R.dequantize(lvl, 30) + rng.integers(-40, 41, lvl.shape)
        return R.sdh_fixup(lvl, coef.astype(np.int32), 30, scan)

    for cy in range(nh):
        for cx in range(nw):
            if d["part_nxn"][cy, cx]:
                for i in range(4):
                    m = int(d["modes4"][cy, cx, i])
                    s = T.intra_scan_idx(3, m, 0)
                    q = d["lvl_y"][cy, cx]
                    dy, dx = (i >> 1) * 8, (i & 1) * 8
                    q[dy:dy + 8, dx:dx + 8] = fx(q[dy:dy + 8, dx:dx + 8], s)
            else:
                d["lvl_y"][cy, cx] = fx(d["lvl_y"][cy, cx], 0)
            cm = int(d["modes4"][cy, cx, 0])
            if d["part_nxn"][cy, cx]:
                # NxN chroma is four 4x4 TBs with the mode-dependent scan
                s4 = T.intra_scan_idx(2, cm, 1)
                for pl in ("lvl_cb", "lvl_cr"):
                    q = d[pl][cy, cx]
                    for i in range(4):
                        dy, dx = (i >> 1) * 4, (i & 1) * 4
                        q[dy:dy + 4, dx:dx + 4] = fx(
                            q[dy:dy + 4, dx:dx + 4], s4)
            else:
                sc = T.intra_scan_idx(3, cm, 1)
                for pl in ("lvl_cb", "lvl_cr"):
                    d[pl][cy, cx] = fx(d[pl][cy, cx], sc)
    for qp in (17, 30, 42):
        cfg = StreamConfig(width=nw * 16, height=nh * 16, qp=qp, sdh=True)
        py = encode_tile_payload_v1(
            cfg, _arrays_to_ctus(d, 0, 0, nh, nw), True)
        cpp = binding.encode_tile_payload_v1(
            qp, d, 0, 0, nh, nw, True, sdh=True)
        assert py == cpp, qp


@pytest.mark.slow
def test_sdh_device_gop_matches_reference():
    """The chunked device production path with sdh drives the same
    IbPbP stream as the numpy reference encoder, byte-identical."""
    from hevc_tpu.encoder.gop import GopEncoder
    rng = np.random.default_rng(5)
    W, H, N = 96, 64, 9
    base = rng.integers(0, 256, (H, W), np.int32)
    frames = []
    for i in range(N):
        y = np.clip(np.roll(base, i * 3, axis=1)
                    + rng.integers(-4, 5, (H, W)), 0, 255).astype(np.int32)
        cb = np.clip(base[::2, ::2] // 2 + 64
                     + rng.integers(-2, 3, (H // 2, W // 2)),
                     0, 255).astype(np.int32)
        cr = np.clip(255 - base[::2, ::2] // 2
                     + rng.integers(-2, 3, (H // 2, W // 2)),
                     0, 255).astype(np.int32)
        frames.append((y, cb, cr))
    cfg = StreamConfig(width=W, height=H, qp=27, inter=True, bframes=True,
                       sdh=True)
    s_np, recons = RefIntraEncoderV1(cfg).encode_video(frames, gop=6)
    s_dev, _ = GopEncoder(cfg).encode_video(frames, gop=6)
    assert s_np == s_dev
    dec = decode_annexb(s_np)
    for f, r in zip(dec, recons):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(f[k], r[k]), k


@needs_avref
def test_sdh_ctb32_conformance():
    from generate_test_videos import synth_frame_kind
    from hevc_tpu.encoder.ctb32_ref import Ctb32RefEncoder, \
        make_ctb32_config
    W, H, F = 96, 64, 4
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, "mixed"))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=27, inter=True,
                            sdh=True)
    stream, recons = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    dec = decode_annexb(stream)
    for d, r in zip(dec, recons):
        for k in ("y", "cb", "cr"):
            assert np.array_equal(d[k], r[k]), k
    ref = avref.decode_hevc(stream)
    assert len(ref) == F
    for a, r in zip(ref, recons):
        assert np.array_equal(a[0].astype(np.int32), r["y"][:H, :W])
