"""Synthetic test clip generator (reference tests/generate_test_videos.py
parity, without ffmpeg): procedural content written as Y4M.

Clips (5 s, 30 fps by default, like the reference's lavfi testsrc set):
  720p/1080p SDR, 1080p "HDR-tagged" (color flags only, 8-bit content —
  exactly the reference's pseudo-HDR trick), plus a tiny 144p smoke clip.
Idempotent: skips existing files.
"""
from __future__ import annotations

from fractions import Fraction
from pathlib import Path

import numpy as np

FIXTURE_DIR = Path(__file__).parent / "sample_videos"


def synth_frame(w: int, h: int, t: int, seed: int = 0):
    """testsrc-like content: gradients, moving bars, noise, color blocks."""
    rng = np.random.default_rng(seed * 1000 + t)
    xx = np.arange(w)[None, :]
    yy = np.arange(h)[:, None]
    y = (xx * 255 // max(w - 1, 1) + yy * 80 // max(h - 1, 1) + t * 3) % 256
    # moving vertical bar
    bx = (t * 7) % max(w - 32, 1)
    y[:, bx:bx + 32] = 235
    # moving box
    by = (t * 5) % max(h - 48, 1)
    y[by:by + 48, w // 4:w // 4 + 64] = 32
    y = np.clip(y + rng.integers(-4, 5, (h, w)), 16, 235).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    cr = np.full((h // 2, w // 2), 128, np.uint8)
    cb[: h // 4, : w // 4] = 90 + (t % 40)
    cr[h // 4:, w // 4:] = 160 - (t % 40)
    return y, cb, cr


def generate_clip(path: Path, w: int, h: int, frames: int,
                  fps=Fraction(30, 1), seed: int = 0) -> Path:
    if path.exists():
        return path
    from hevc_tpu.io.y4m import write_y4m
    path.parent.mkdir(parents=True, exist_ok=True)
    write_y4m(path, [synth_frame(w, h, t, seed) for t in range(frames)], fps)
    return path


CLIPS = [
    ("smoke_144p", 176, 144, 10),
    ("sdr_720p", 1280, 720, 150),
    ("sdr_1080p", 1920, 1080, 150),
    ("hdr_1080p", 1920, 1080, 150),   # pseudo-HDR: tagged at encode time
]


def generate_all(only_small: bool = True) -> list[Path]:
    out = []
    for name, w, h, n in CLIPS:
        if only_small and h > 360:
            continue
        out.append(generate_clip(FIXTURE_DIR / f"{name}.y4m", w, h, n))
    return out


if __name__ == "__main__":
    for name, w, h, n in CLIPS:
        p = generate_clip(FIXTURE_DIR / f"{name}.y4m", w, h, n)
        print(p)
