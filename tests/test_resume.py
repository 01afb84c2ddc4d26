"""Checkpoint/resume behavior (file-level skip + segment sidecar)."""
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
sys.path.insert(0, str(Path(__file__).parent))
from generate_test_videos import generate_clip  # noqa: E402

from hevc_tpu.batch.transcode import convert_video  # noqa: E402
from hevc_tpu.batch import resume as RZ  # noqa: E402


@pytest.mark.slow
def test_file_level_resume_skip(tmp_path):
    src = generate_clip(tmp_path / "in" / "c.y4m", 176, 144, 4)
    r1 = convert_video(src, tmp_path / "out", resume=True)
    assert r1["status"] == "SUCCESS" and r1["method"] != "resume-skip"
    r2 = convert_video(src, tmp_path / "out", resume=True)
    assert r2["status"] == "SUCCESS" and r2["method"] == "resume-skip"
    # without resume it re-encodes
    r3 = convert_video(src, tmp_path / "out")
    assert r3["method"] in ("tpu", "cpu-ref")


def test_checkpoint_roundtrip(tmp_path):
    out = tmp_path / "x.mp4"
    samples = [b"abc", b"defg", b"\x00" * 100]
    RZ.save_checkpoint(out, "fp1", samples)
    assert RZ.load_checkpoint(out, "fp1") == samples
    assert RZ.load_checkpoint(out, "other") is None    # stale fingerprint
    RZ.clear_checkpoint(out)
    assert RZ.load_checkpoint(out, "fp1") is None


def test_fingerprint_changes_with_config(tmp_path):
    src = generate_clip(tmp_path / "c.y4m", 176, 144, 3)
    from hevc_tpu.entropy.headers import StreamConfig
    a = RZ.config_fingerprint(src, StreamConfig(width=176, height=144, qp=30), 3)
    b = RZ.config_fingerprint(src, StreamConfig(width=176, height=144, qp=31), 3)
    assert a != b
