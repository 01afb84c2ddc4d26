"""Benchmark: 1080p GOP encode throughput per chip vs libx265-medium.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value  = frames/second of the REAL production encode loop on the ctb32
         preset (32/16 coding quadtree, IbbP mini-GOPs, SAO, SDH,
         weightp) — the flagship production path: fused per-frame device
         dispatch (search + RD + TU + deblock + SAO + ref padding +
         packed syntax) with host CABAC (C++, tile-parallel) overlapped
         on a worker thread.  Wall-clock measured around the whole loop;
         no per-stage max() accounting.
vs_baseline = value / libx265-medium fps (inter, same GOP) on this host's
         CPU — the reference's CPU encode path (BASELINE.md).
Detail lines (bitrate, ctb16-medium row, 4K row, device diagnostics) go
to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def x265_baseline(frames, label, gop=30):
    """Single-threaded libx265-medium on this host (the reference's CPU
    delegate, core/transcoder.py:398-412)."""
    try:
        from hevc_tpu.validate import avref
        if not avref.available():
            return 0.0
        u8 = [tuple(np.asarray(p, np.uint8) for p in f) for f in frames]
        t0 = time.time()
        bs = avref.encode(u8, "libx265", crf=23, preset="medium",
                          opts=f"x265-params=keyint={gop}:no-scenecut=1")
        base_s = time.time() - t0
        fps = len(frames) / base_s
        log(f"[{label}] libx265-medium baseline: {fps:.2f} fps "
            f"({len(bs)} bytes)")
        return fps
    except Exception as e:
        log("baseline failed:", e)
        return 0.0


def bench_ctb32(W, H, F, QP, label, synth_frame, iters=2):
    """Flagship: the ctb32 preset's pipelined production loop."""
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder, make_ctb32_config
    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 31) // 32, (W + 31) // 32, ctb=32)
    log(f"[{label}] ctb32 tile grid: {tc}x{tr}")
    cfg = make_ctb32_config(width=W, height=H, qp=QP, tile_cols=tc,
                            tile_rows=tr, inter=True, bframes=True,
                            sdh=True, sao=True, weightp=True,
                            bframes_n=2)   # the ctb32 preset toolset
    enc = Ctb32GopEncoder(cfg)
    t0 = time.time()
    enc.warmup_parallel()       # I/P/B graphs compile concurrently
    t_c = time.time() - t0
    t0 = time.time()
    bs = enc.encode_video(frames, gop=30)
    log(f"[{label}] compile(parallel): {t_c:.1f}s, first encode: "
        f"{time.time()-t0:.1f}s (compile+first {t_c+time.time()-t0:.1f}s), "
        f"{len(bs)} bytes ({len(bs)*8*30/F/1e6:.2f} Mbps @30fps)")
    t0 = time.time()
    n = 0
    for _ in range(iters):
        enc.encode_video(frames, gop=30)
        n += F
    fps = n / (time.time() - t0)
    log(f"[{label}] pipelined end-to-end: {1000/fps:.1f} ms/frame "
        f"= {fps:.2f} fps")
    return fps, frames


def bench_ctb16(W, H, F, QP, label, synth_frame):
    """Diagnostic: the ctb16 medium preset's chunked pipelined loop +
    device-only / entropy-only stage splits."""
    from collections import deque

    import jax
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import GopEncoder, b_schedule, chunk_groups
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1

    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 15) // 16, (W + 15) // 16)
    log(f"[{label}] tile grid: {tc}x{tr}")
    cfg = StreamConfig(width=W, height=H, qp=QP, tile_cols=tc, tile_rows=tr,
                       inter=True, bframes=True, sao=True, sdh=True,
                       weightp=True,
                       bframes_n=2)   # the medium preset (planner/presets)
    enc = GopEncoder(cfg)

    # warm up / compile + collect real decisions for the entropy split
    t0 = time.time()
    nals, decs = [], []
    sched = b_schedule(F, 30, True, cfg.bframes_n)
    for grp in chunk_groups(sched, True, 8):
        nals += enc.encode_chunk_async([frames[e[0]] for e in grp],
                                       [e[1:] for e in grp],
                                       chunk=8).result()
        decs.append((enc._last_dec, grp[-1][1] == 2))
    log(f"[{label}] compile+first GOP: {time.time()-t0:.1f}s, "
        f"{sum(len(n) for n in nals)} bytes "
        f"({sum(len(n) for n in nals)*8*30/F/1e6:.2f} Mbps @30fps)")

    t0 = time.time()
    n = 0
    for it in range(2):
        enc.reset()
        pending = deque()
        groups = chunk_groups(sched, True, 8)
        for grp, fut in enc.encode_groups_pipelined(frames, groups,
                                                    chunk=8):
            pending.append(fut)
            n += len(grp)
            while len(pending) > 2:
                pending.popleft().result()
        while pending:
            pending.popleft().result()
    fps = n / (time.time() - t0)
    log(f"[{label}] pipelined end-to-end: {1000/fps:.1f} ms/frame "
        f"= {fps:.2f} fps")

    t0 = time.time()
    for i, (d, is_b) in enumerate(decs):
        entropy_encode_frame_v1(cfg, d, poc=i + 1, b_slice=is_b)
    entropy_s = (time.time() - t0) / max(len(decs), 1)
    log(f"[{label}] host entropy: {entropy_s*1000:.1f} ms/frame")
    return fps


_JSON_DONE = False


def emit(fps, base_fps):
    global _JSON_DONE
    if _JSON_DONE:
        return
    _JSON_DONE = True
    print(json.dumps({
        "metric": "1080p_gop_encode_fps_per_chip_vs_x265_medium",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / base_fps, 3) if base_fps else 0.0,
    }), flush=True)


def main():
    import os
    import signal
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    # Watchdog: whatever happens, a canonical JSON line is on stdout and
    # the process exits 0 before any plausible driver budget (round-3
    # failure mode: rc=124, parsed=null).
    BUDGET_S = 2700.0

    def _alarm(signum, frame):
        log("WATCHDOG: wall budget reached; emitting and exiting")
        emit(0.0, 0.0)
        os._exit(0)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(int(BUDGET_S))

    log("devices:", jax.devices())
    sys.path.insert(0, "tests")
    from generate_test_videos import synth_frame

    wall0 = time.time()
    fps, frames = bench_ctb32(1920, 1080, 16, 27, "1080p", synth_frame)
    base_fps = x265_baseline(frames, "1080p")

    # Canonical JSON FIRST — diagnostics below must never cost the round
    # its headline number.
    emit(fps, base_fps)

    # Diagnostics under a wall-clock guard: skip any stage that would
    # plausibly run past the driver's budget.
    def left():
        return BUDGET_S - (time.time() - wall0)

    if left() > 600:
        try:
            fps4k, _ = bench_ctb32(3840, 2160, 8, 27, "4k", synth_frame,
                                   iters=1)
            log(f"[4k] {fps4k:.2f} fps (north star: 30)")
        except Exception as e:
            log("4k bench failed:", e)
    else:
        log(f"[4k] skipped (only {left():.0f}s budget left)")
    if left() > 400:
        try:
            fps16 = bench_ctb16(1920, 1080, 16, 27, "1080p-ctb16",
                                synth_frame)
            log(f"[1080p-ctb16] medium preset: {fps16:.2f} fps")
        except Exception as e:
            log("ctb16 bench failed:", e)
    else:
        log(f"[1080p-ctb16] skipped (only {left():.0f}s budget left)")


if __name__ == "__main__":
    main()
