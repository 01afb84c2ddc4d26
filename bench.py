"""Benchmark: 1080p GOP (MC inter) encode throughput per chip vs libx265.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value  = frames/second of the REAL production encode loop — the same
         pipelined path convert_video runs: fused on-chip P-frame step
         (MC search + TU + deblock + ref padding) dispatched for frame N+1
         while frame N's decision fetch + host CABAC (C++, tile-parallel)
         run on the GopEncoder worker thread.  Wall-clock measured around
         the whole loop; no per-stage max() accounting.
vs_baseline = value / libx265-medium fps (inter, same GOP) on this host's
         CPU — the reference's CPU encode path (BASELINE.md).
Detail lines (device-only, entropy-only, 4K row) go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pipeline_fps(enc, frames, iters=2, gop=30, chunk=8):
    """Sustained fps of the production chunked loop (convert_video's path):
    one fused device dispatch per chunk (IbPbP when cfg.bframes), host
    CABAC overlapped."""
    from collections import deque
    from hevc_tpu.encoder.gop import b_schedule, chunk_groups
    sched = b_schedule(len(frames), gop, enc.cfg.bframes,
                       enc.cfg.bframes_n)
    groups = chunk_groups(sched, enc.cfg.bframes, chunk)
    t0 = time.time()
    n = 0
    for it in range(iters):
        enc.reset()
        pending = deque()
        for grp, fut in enc.encode_groups_pipelined(frames, groups,
                                                    chunk=chunk):
            pending.append(fut)
            n += len(grp)
            while len(pending) > 2:
                pending.popleft().result()
        while pending:
            pending.popleft().result()
    return n / (time.time() - t0)


def bench_res(W, H, F, QP, label, synth_frame, baseline=False):
    import jax
    import jax.numpy as jnp
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import GopEncoder
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
    enc = GopEncoder(cfg)            # medium preset (NxN + MC + B)

    # ---- warm up / compile + collect real decisions ----
    from hevc_tpu.encoder.gop import b_schedule
    t0 = time.time()
    nals, decs = [], []
    sched = b_schedule(F, 30, True, cfg.bframes_n)
    from hevc_tpu.encoder.gop import chunk_groups
    for grp in chunk_groups(sched, True, 8):
        nals += enc.encode_chunk_async([frames[e[0]] for e in grp],
                                       [e[1:] for e in grp],
                                       chunk=8).result()
        decs.append((enc._last_dec, grp[-1][1] == 2))
    log(f"[{label}] compile+first GOP: {time.time()-t0:.1f}s, "
        f"{sum(len(n) for n in nals)} bytes "
        f"({sum(len(n) for n in nals)*8*30/F/1e6:.2f} Mbps @30fps)")

    # ---- the canonical number: the real pipelined loop ----
    fps = pipeline_fps(enc, frames)
    log(f"[{label}] pipelined end-to-end: {1000/fps:.1f} ms/frame "
        f"= {fps:.2f} fps")

    # ---- diagnostics: device-only steady-state P loop ----
    from hevc_tpu.encoder.gop import _gop_step_jit
    from hevc_tpu.encoder.rowscan_v1 import RowScanEncoderV1
    from hevc_tpu.encoder.ctu_modes import skip_lambda16
    nh, nw, Hp, Wp = enc._geom
    tnh, tnw = nh // tr, nw // tc
    rs = RowScanEncoderV1(QP)
    lam16 = jnp.asarray(skip_lambda16(QP), jnp.int32)
    sl16 = jnp.asarray(int(np.sqrt(0.85 * 2 ** ((QP - 12) / 3)) * 16),
                       jnp.int32)
    qpj = jnp.asarray(QP)
    srcs = []
    for f in frames:
        yb, cbb, crb = enc._to_blocks(*[np.asarray(p, np.int32) for p in f])
        srcs.append((jnp.asarray(enc._tsplit(yb, 16)),
                     jnp.asarray(enc._tsplit(cbb, 8)),
                     jnp.asarray(enc._tsplit(crb, 8))))
    pads = enc._ref_blocks[1]          # (prev, cur) carry -> current ref

    def p_step(src3, pads):
        outs = _gop_step_jit(*src3, *pads, qpj, rs.lam_bits, lam16, sl16,
                             tnh, tnw, tr, tc, 8, enc.nxn_p, True, False,
                             False, True)           # medium: subpel, no SAO
        return outs, outs[26:29]

    import jax
    outs, pads = p_step(srcs[0], pads)   # warm (compiled already)
    jax.block_until_ready(pads)
    iters = 2
    t0 = time.time()
    for _ in range(iters):
        for s in srcs:
            outs, pads = p_step(s, pads)
        jax.block_until_ready(pads)
    dev_only = (time.time() - t0) / (iters * F)
    log(f"[{label}] device-only P loop: {dev_only*1000:.1f} ms/frame "
        f"= {1/dev_only:.1f} fps")

    # ---- diagnostics: host entropy on the real decisions ----
    t0 = time.time()
    for i, (d, is_b) in enumerate(decs):
        entropy_encode_frame_v1(cfg, d, poc=i + 1, b_slice=is_b)
    entropy_s = (time.time() - t0) / max(len(decs), 1)
    log(f"[{label}] host entropy: {entropy_s*1000:.1f} ms/frame")

    base_fps = 0.0
    if baseline:
        try:
            from hevc_tpu.validate import avref
            if avref.available():
                u8 = [tuple(np.asarray(p, np.uint8) for p in f)
                      for f in frames]
                t0 = time.time()
                bs = avref.encode(u8, "libx265", crf=23, preset="medium",
                                  opts="x265-params=keyint=30:no-scenecut=1")
                base_s = time.time() - t0
                base_fps = F / base_s
                log(f"[{label}] libx265-medium baseline: {base_fps:.2f} fps "
                    f"({len(bs)} bytes)")
        except Exception as e:
            log("baseline failed:", e)
    return fps, base_fps


def bench_ctb32(W, H, F, QP, synth_frame):
    """ctb32-preset (32/16 quadtree IbPbP + SDH) fps + bitrate at 1080p."""
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder, make_ctb32_config
    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 31) // 32, (W + 31) // 32, ctb=32)
    cfg = make_ctb32_config(width=W, height=H, qp=QP, tile_cols=tc,
                            tile_rows=tr, inter=True, bframes=True,
                            sdh=True)
    enc = Ctb32GopEncoder(cfg)
    t0 = time.time()
    bs = enc.encode_video(frames, gop=30)
    log(f"[ctb32] compile+first: {time.time()-t0:.1f}s, {len(bs)} bytes "
        f"({len(bs)*8*30/F/1e6:.2f} Mbps @30fps)")
    t0 = time.time()
    n = 0
    for _ in range(2):
        enc.encode_video(frames, gop=30)
        n += F
    fps = n / (time.time() - t0)
    log(f"[ctb32] pipelined end-to-end: {1000/fps:.1f} ms/frame "
        f"= {fps:.2f} fps")
    return fps


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    log("devices:", jax.devices())
    sys.path.insert(0, "tests")
    from generate_test_videos import synth_frame

    fps, base_fps = bench_res(1920, 1080, 16, 27, "1080p", synth_frame,
                              baseline=True)
    try:
        bench_ctb32(1920, 1080, 16, 27, synth_frame)
    except Exception as e:
        log("ctb32 bench failed:", e)
    try:
        fps4k, _ = bench_res(3840, 2160, 8, 27, "4k", synth_frame)
        log(f"[4k] {fps4k:.2f} fps (north star: 30)")
    except Exception as e:
        log("4k bench failed:", e)

    print(json.dumps({
        "metric": "1080p_gop_encode_fps_per_chip_vs_x265_medium",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / base_fps, 3) if base_fps else 0.0,
    }))


if __name__ == "__main__":
    main()
