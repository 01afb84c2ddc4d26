"""Y4M / probe / MP4 mux + parse / convert_video / batch end-to-end."""
import sys
import threading
from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from generate_test_videos import generate_clip, synth_frame  # noqa: E402

from hevc_tpu.io.probe import probe_media  # noqa: E402
from hevc_tpu.io.y4m import Y4MReader, write_y4m  # noqa: E402


def test_y4m_roundtrip(tmp_path):
    frames = [synth_frame(64, 48, t) for t in range(5)]
    p = tmp_path / "clip.y4m"
    write_y4m(p, frames, Fraction(30000, 1001))
    r = Y4MReader(p)
    assert (r.width, r.height) == (64, 48)
    assert r.fps == Fraction(30000, 1001)
    assert r.count_frames() == 5
    got = r.read_all()
    assert len(got) == 5
    for (a, b) in zip(got, frames):
        for x, y in zip(a, b):
            assert np.array_equal(x, y)


def test_probe_y4m(tmp_path):
    p = generate_clip(tmp_path / "c.y4m", 176, 144, 8)
    info = probe_media(p)
    assert (info.width, info.height) == (176, 144)
    assert info.nb_frames == 8
    assert not info.is_hdr
    assert info.container == "y4m"


def test_probe_never_raises(tmp_path):
    bad = tmp_path / "garbage.mp4"
    bad.write_bytes(b"not a real file")
    info = probe_media(bad)
    assert (info.width, info.height) == (1920, 1080)   # safe defaults


def _convert(tmp_path, **kw):
    from hevc_tpu.batch.transcode import convert_video
    src = generate_clip(tmp_path / "in" / "clip.y4m", 176, 144, 6)
    out = tmp_path / "out"
    return convert_video(src, out, **kw), out / "clip.mp4"


def test_convert_video_end_to_end(tmp_path):
    res, out = _convert(tmp_path)
    assert res["status"] == "SUCCESS", res
    assert res["file"] == "clip.y4m"
    assert set(res) == {"file", "status", "quality", "retries", "method",
                        "hdr"}
    assert out.exists()
    info = probe_media(out)
    assert info.codec_name == "hevc"
    assert (info.width, info.height) == (176, 144)
    assert info.nb_frames == 6


def test_output_mp4_structure(tmp_path):
    _, out = _convert(tmp_path)
    from hevc_tpu.io.mp4parse import probe_mp4
    d = probe_mp4(out)
    assert d["brand"] == "mp42"
    assert d["sample_entry"] == "hvc1"
    assert d["faststart"] is True
    assert "colr" in d
    assert d["hvcc"]["length_size"] == 4


def test_validator_accepts_output(tmp_path):
    _, out = _convert(tmp_path, skip_validator=True)
    from hevc_tpu.validate.validator import validate_mp4
    ok, msgs = validate_mp4(out)
    assert ok, msgs


def test_samples_start_with_aud(tmp_path):
    """Every access unit leads with an AUD NAL (reference `-aud 1`,
    core/transcoder.py:148-153)."""
    _, out = _convert(tmp_path, skip_validator=True)
    from hevc_tpu.io.mp4parse import extract_samples
    _, samples = extract_samples(out)
    assert samples
    for s in samples:
        sz = int.from_bytes(s[:4], "big")
        assert (s[4] >> 1) & 0x3F == 35 and sz >= 2


def test_nvenc_hdr_mode_disable_gates_fast_path():
    """`disable` forces the robust path (reference apple_hevc_batch.py:
    278-285); force_cpu has precedence over everything."""
    from hevc_tpu.batch.transcode import decide_encoder
    assert decide_encoder(False, True, "disable") is False
    assert decide_encoder(True, True, "auto") is False
    assert decide_encoder(False, True, "prefer") is True


def test_convert_cancellation(tmp_path):
    ev = threading.Event()
    calls = []

    def cb(name, frame, total):
        calls.append((frame, total))
        if len(calls) == 1:
            ev.set()

    res, _ = _convert(tmp_path, stop_event=ev, progress_callback=cb,
                      force_cpu=True)
    assert res["status"] == "CANCELLED"
    assert calls[-1][0] == calls[-1][1]    # progress forced to 100%


def test_batch_convert(tmp_path):
    from hevc_tpu.batch.scheduler import batch_convert
    for k in range(2):
        generate_clip(tmp_path / "in" / f"c{k}.y4m", 176, 144, 4, seed=k)
    results = batch_convert(tmp_path / "in", tmp_path / "out", max_workers=2)
    assert len(results) == 2
    assert all(r["status"] == "SUCCESS" for r in results)
    csv_path = tmp_path / "out" / "transcode_log.csv"
    assert csv_path.exists()
    header = csv_path.read_text().splitlines()[0]
    assert header == "file,status,quality,retries,method,hdr"


def test_never_overwrite_input(tmp_path):
    """Output into the input's own directory must not clobber the source."""
    from hevc_tpu.batch.transcode import convert_video
    src = generate_clip(tmp_path / "clip.y4m", 176, 144, 3)
    res = convert_video(src, tmp_path)
    assert res["status"] == "SUCCESS"
    assert src.exists() and (tmp_path / "clip.mp4").exists()


def test_decode_back_psnr(tmp_path):
    """Our .mp4 output decodes (independently) close to the source."""
    from hevc_tpu.validate import avref
    if not avref.available():
        pytest.skip("avref unavailable")
    _, out = _convert(tmp_path)
    dec = avref.decode_file(str(out))
    src = Y4MReader(generate_clip(tmp_path / "in" / "clip.y4m", 176, 144, 6)).read_all()
    assert len(dec) == 6
    psnr = np.mean([10 * np.log10(255**2 / max(np.mean(
        (d[0].astype(float) - s[0].astype(float))**2), 1e-9))
        for d, s in zip(dec, src)])
    assert psnr > 33, psnr


def test_y4m_10bit_roundtrip(tmp_path):
    from hevc_tpu.io.y4m import write_y4m, Y4MReader
    rng = np.random.default_rng(0)
    fr = [(rng.integers(0, 1024, (64, 96)).astype(np.uint16),
           rng.integers(0, 1024, (32, 48)).astype(np.uint16),
           rng.integers(0, 1024, (32, 48)).astype(np.uint16))
          for _ in range(2)]
    p = tmp_path / "t10.y4m"
    write_y4m(p, fr, bit_depth=10)
    r = Y4MReader(p)
    assert r.bit_depth == 10
    back = r.read_all()
    for i in range(2):
        for j in range(3):
            assert np.array_equal(back[i][j], fr[i][j])
    from hevc_tpu.io.probe import probe_media
    info = probe_media(p)
    assert info.bit_depth == 10 and info.pix_fmt == "yuv420p10le"


def test_audio_resampler_quality():
    from hevc_tpu.planner.audio import resample_pcm
    t = np.arange(44100) / 44100.0
    pcm = (np.sin(2 * np.pi * 1000 * t) * 20000).astype(np.int16)[:, None]
    out = resample_pcm(pcm, 44100, 48000)
    assert len(out) == 48000
    ideal = np.sin(2 * np.pi * 1000 * np.arange(len(out)) / 48000.0) * 20000
    best = min(np.mean((out[400:-400, 0]
                        - np.roll(ideal, s)[400:-400]) ** 2)
               for s in range(-40, 41))
    snr = 10 * np.log10(np.mean(ideal ** 2) / best)
    assert snr > 60, snr
    # DC transparency
    dc = resample_pcm(np.full((500, 2), 1234, np.int16), 44100, 48000)
    assert dc[50:-50].min() == 1234 and dc[50:-50].max() == 1234
