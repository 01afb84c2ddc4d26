"""Recon-digest (validate/digest.py): device/host bit-agreement and
corruption sensitivity — the basis of the validator's whole-stream
pixel verification (VERDICT r2 weak #5)."""
import numpy as np
import pytest

from hevc_tpu.validate.digest import (digest_frame_j, digest_frame_np,
                                      verify_digests)


def _frame(rng, h, w, hi=256):
    return (rng.integers(0, hi, (h, w)).astype(np.int32),
            rng.integers(0, hi, (h // 2, w // 2)).astype(np.int32),
            rng.integers(0, hi, (h // 2, w // 2)).astype(np.int32))


def test_digest_device_matches_host():
    import jax
    rng = np.random.default_rng(7)
    for h, w, hi in ((64, 96, 256), (48, 48, 1024)):  # 8- and 10-bit
        y, cb, cr = _frame(rng, h, w, hi)
        dj = np.asarray(jax.jit(digest_frame_j)(y, cb, cr))
        dn = digest_frame_np(y, cb, cr)
        assert np.array_equal(dj, dn)


def test_digest_flips_on_any_single_pixel():
    rng = np.random.default_rng(8)
    y, cb, cr = _frame(rng, 32, 32)
    base = digest_frame_np(y, cb, cr)
    for plane in (y, cb, cr):
        for _ in range(8):
            i = rng.integers(0, plane.shape[0])
            j = rng.integers(0, plane.shape[1])
            old = plane[i, j]
            plane[i, j] = old ^ 1
            assert not np.array_equal(digest_frame_np(y, cb, cr), base)
            plane[i, j] = old


def test_verify_digests_crop_and_mismatch():
    rng = np.random.default_rng(9)
    frames = [_frame(rng, 34, 50) for _ in range(3)]
    # encoder-side digests over the cropped 30x48 region
    digs = [digest_frame_np(y[:30, :48], cb[:15, :24], cr[:15, :24])
            for y, cb, cr in frames]
    assert verify_digests(frames, digs, crop=(30, 48)) == []
    frames[1][0][10, 10] ^= 3           # corrupt inside the crop
    msgs = verify_digests(frames, digs, crop=(30, 48))
    assert msgs and "frame 1" in msgs[0]


@pytest.mark.slow
def test_chunked_digests_match_decoded_frames():
    """The chunk scan's device digests must equal digests of the decoded
    display frames (the validator's whole-stream pixel check end to end:
    device digest -> bitstream -> decode_annexb -> host digest)."""
    from hevc_tpu.encoder.gop import GopEncoder, b_schedule
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.decoder.decode import decode_annexb

    rng = np.random.default_rng(12)
    W, H, N = 96, 64, 9
    base = rng.integers(0, 256, (H, W), np.int32)
    frames = []
    for i in range(N):
        y = np.clip(np.roll(base, i * 2, axis=1)
                    + rng.integers(-3, 4, (H, W)), 0, 255).astype(np.int32)
        cb = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        cr = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        frames.append((y, cb, cr))
    cfg = StreamConfig(width=W, height=H, qp=27, inter=True, bframes=True)
    enc = GopEncoder(cfg)
    stream = enc.encode_video_chunked(frames, gop=6, chunk=4)
    sched = b_schedule(N, 6, True)
    assert len(enc.recon_digests) == N
    dec = decode_annexb(stream)          # display order
    checked = 0
    for j, d in enumerate(sched):
        dig = enc.recon_digests[j]
        if d[1] == 2:
            assert dig is None           # non-reference B: no digest yet
            continue
        got = digest_frame_np(*(dec[d[0]][k] for k in ("y", "cb", "cr")))
        assert np.array_equal(np.asarray(dig), got), (j, d)
        checked += 1
    assert checked >= 6


@pytest.mark.slow
def test_gop32_digests_match_decoded_frames():
    """ctb32 production driver digests (I/P; B deferred) equal digests of
    the decoded display frames, including the conformance-window crop
    (80 is not a CTB32 multiple).  Also regression-covers the value-fetch
    capacity-miss path (nnz > coef_elems/2 on dense content)."""
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder
    from hevc_tpu.encoder.ctb32_ref import make_ctb32_config
    from hevc_tpu.encoder.gop import b_schedule
    from hevc_tpu.decoder.decode import decode_annexb
    from hevc_tpu.utils.bitio import annexb

    rng = np.random.default_rng(5)
    W, H, N = 96, 80, 7
    base = rng.integers(0, 256, (H, W), np.int32)
    frames = []
    for i in range(N):
        y = np.clip(np.roll(base, i * 2, axis=1)
                    + rng.integers(-3, 4, (H, W)), 0, 255).astype(np.int32)
        cb = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        cr = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        frames.append((y, cb, cr))
    cfg = make_ctb32_config(width=W, height=H, qp=27, inter=True,
                            bframes=True, sdh=True)
    enc = Ctb32GopEncoder(cfg)
    sched = b_schedule(N, 0, True)
    futs = []
    for (disp, kind, poc, rps) in sched:
        f = frames[disp]
        if kind == 2:
            futs.append(enc.encode_b_async(*f, pocs=(poc, poc - 1,
                                                     poc + 1)))
        else:
            futs.append(enc.encode_next_async(*f, idr=kind == 0, poc=poc,
                                              rps_idx=rps))
    nals = [f.result() for f in futs]
    dec = decode_annexb(annexb(enc.parameter_sets() + nals))
    assert len(enc.recon_digests) == N
    checked = 0
    for j, (disp, kind, poc, rps) in enumerate(sched):
        dig = enc.recon_digests[j]
        if kind == 2:
            assert dig is None
            continue
        fr = dec[disp]
        got = digest_frame_np(fr["y"][:H, :W], fr["cb"][:H // 2, :W // 2],
                              fr["cr"][:H // 2, :W // 2])
        assert np.array_equal(np.asarray(dig), got), (j, disp)
        checked += 1
    assert checked == 4


def test_validator_rejects_wrong_digest(tmp_path):
    """validate_mp4(recon_digests=...) passes on true digests and fails
    when any frame's digest disagrees with the libavcodec decode."""
    from generate_test_videos import generate_clip
    from hevc_tpu.batch.transcode import convert_video
    from hevc_tpu.validate import avref
    from hevc_tpu.validate.validator import validate_mp4

    if not avref.available():
        pytest.skip("libavcodec oracle unavailable")
    src = generate_clip(tmp_path / "in" / "clip.y4m", 48, 32, 3)
    res = convert_video(src, tmp_path / "out", force_cpu=True)
    assert res["status"] == "SUCCESS", res
    out = tmp_path / "out" / "clip.mp4"
    dec = avref.decode_file(str(out))
    digs = {i: digest_frame_np(*f) for i, f in enumerate(dec)}
    ok, msgs = validate_mp4(out, recon_digests=digs)
    assert ok, msgs
    digs[2] = np.asarray(digs[2], np.int32) ^ 1
    ok, msgs = validate_mp4(out, recon_digests=digs)
    assert not ok and any("digest" in m for m in msgs), msgs
