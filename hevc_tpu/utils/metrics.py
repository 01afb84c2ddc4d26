"""Observability: per-stage timers, throughput metrics, jax profiler hooks.

The reference had only `frame=` stdout parsing and tqdm (SURVEY section 5,
'Tracing/profiling: none').  This framework makes encode telemetry
first-class: per-stage wall times, fps/chip, bitstream rates, and optional
jax.profiler traces for TPU timeline analysis.
"""
from __future__ import annotations

import contextlib
import json
import logging
import threading
import time
from collections import defaultdict
from pathlib import Path

log = logging.getLogger(__name__)


class StageTimers:
    """Thread-safe accumulating stage timers."""

    def __init__(self):
        self._lock = threading.Lock()
        self._total = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._total[name] += dt
                self._count[name] += 1

    def add(self, name: str, seconds: float, n: int = 1) -> None:
        with self._lock:
            self._total[name] += seconds
            self._count[name] += n

    def summary(self) -> dict:
        with self._lock:
            return {k: {"total_s": round(v, 4), "count": self._count[k],
                        "mean_ms": round(1000 * v / max(self._count[k], 1), 2)}
                    for k, v in sorted(self._total.items())}

    def log_summary(self, prefix: str = "timers") -> None:
        log.info("%s: %s", prefix, json.dumps(self.summary()))


GLOBAL_TIMERS = StageTimers()


@contextlib.contextmanager
def jax_trace(out_dir: str | Path | None):
    """jax.profiler trace scope (no-op when out_dir is None)."""
    if not out_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(str(out_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("jax profiler trace written to %s", out_dir)


class EncodeStats:
    """Per-stream encode statistics (fps, bitrate, quality proxy)."""

    def __init__(self, width: int, height: int, fps: float):
        self.width = width
        self.height = height
        self.fps = fps
        self.frames = 0
        self.bytes = 0
        self.wall_start = time.perf_counter()

    def frame_done(self, nal_bytes: int) -> None:
        self.frames += 1
        self.bytes += nal_bytes

    def summary(self) -> dict:
        wall = time.perf_counter() - self.wall_start
        return {
            "frames": self.frames,
            "encode_fps": round(self.frames / wall, 2) if wall > 0 else 0.0,
            "realtime_x": round(self.frames / wall / self.fps, 3)
            if wall > 0 and self.fps else 0.0,
            "bitrate_mbps": round(self.bytes * 8 * self.fps
                                  / max(self.frames, 1) / 1e6, 3),
        }
