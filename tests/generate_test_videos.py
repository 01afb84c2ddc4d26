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


def _texture(w: int, h: int, seed: int, detail: float = 1.0) -> np.ndarray:
    """Band-limited procedural texture in [16, 235] (float32)."""
    rng = np.random.default_rng(seed)
    acc = np.zeros((h, w), np.float32)
    for scale, amp in ((8, 60), (16, 45), (32, 35), (64, 25)):
        g = rng.standard_normal((h // scale + 2, w // scale + 2)).astype(
            np.float32) * amp * (detail if scale <= 16 else 1.0)
        gy = np.repeat(np.repeat(g, scale, 0), scale, 1)[:h, :w]
        acc += gy
    acc += rng.standard_normal((h, w)).astype(np.float32) * 2.5 * detail
    lo, hi = acc.min(), acc.max()
    return 16 + (acc - lo) * (219.0 / max(hi - lo, 1e-6))


def synth_frame_kind(w: int, h: int, t: int, kind: str = "mixed",
                     seed: int = 0):
    """Content classes for the quality harness (SURVEY §6 measurement duty):

    mixed  — the default testsrc-like scene (gradients + movers + noise)
    pan    — textured scene under a 9 px/frame global pan (motion search)
    detail — static high-frequency texture (intra/RD efficiency)
    noise  — fresh per-frame noise on flat background (worst-case rate)
    """
    if kind == "mixed":
        return synth_frame(w, h, t, seed)
    if kind == "pan":
        key = ("pan", w, h, seed)
        tex = _PAN_CACHE.get(key)
        if tex is None:
            tex = _texture(w + 640, h + 160, seed + 7)
            _PAN_CACHE[key] = tex
        ox, oy = 16 + 9 * t, 8 + 2 * t
        y = tex[oy:oy + h, ox:ox + w]
        cb = 118 + y[::2, ::2] / 16.0
        cr = 138 - y[1::2, ::2] / 16.0
    elif kind == "detail":
        key = ("detail", w, h, seed)
        tex = _PAN_CACHE.get(key)
        if tex is None:
            tex = _texture(w, h, seed + 13, detail=2.5)
            _PAN_CACHE[key] = tex
        y = tex
        cb = np.full((h // 2, w // 2), 120.0)
        cr = np.full((h // 2, w // 2), 132.0)
    elif kind == "noise":
        rng = np.random.default_rng(seed * 4099 + t)
        y = 128 + rng.standard_normal((h, w)) * 28.0
        cb = 128 + rng.standard_normal((h // 2, w // 2)) * 8.0
        cr = 128 + rng.standard_normal((h // 2, w // 2)) * 8.0
    else:
        raise ValueError(kind)
    to8 = lambda a: np.clip(np.round(a), 16, 235).astype(np.uint8)  # noqa: E731
    return to8(y), to8(cb), to8(cr)


_PAN_CACHE: dict = {}


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
