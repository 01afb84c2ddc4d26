"""One-attach TPU work session: verify + profile + bench in a single process.

The axon tunnel on this machine tolerates exactly one client attach per
~10-minute window (a killed or cleanly-exited client leaves the far side
in cleanup; new attaches hang forever on a futex).  So every piece of TPU
work this round runs in ONE process, phased:

  python tools/tpu_session.py verify profile bench     # any subset, in order

Phases:
  verify  — CLI end-to-end on /tmp/vfix fixtures + libavcodec decode-back
  profile — pipelined-loop stage timers (1080p, 16 frames)
  bench   — canonical bench.py main() (prints the JSON line)
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def phase_verify():
    log("=== phase: verify ===")
    from hevc_tpu.cli import main as cli_main
    rc = cli_main(["-i", "/tmp/vfix", "-o", "/tmp/vout",
                   "--preset", "medium"])
    log("CLI rc:", rc)
    from hevc_tpu.validate import avref
    from pathlib import Path
    for p in sorted(Path("/tmp/vout").glob("*.mp4")):
        try:
            dec = avref.decode_file(str(p))
            log(f"{p.name}: decoded {len(dec)} frames {dec[0][0].shape}")
        except Exception as e:
            log(f"{p.name}: DECODE ERR {e}")
    try:
        log(Path("transcode_log.csv").read_text())
    except Exception:
        pass
    return rc == 0


def phase_profile():
    log("=== phase: profile ===")
    import numpy as np
    from collections import deque
    from generate_test_videos import synth_frame
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import GopEncoder, b_schedule, chunk_groups
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.utils.metrics import GLOBAL_TIMERS

    W, H, F, QP = 1920, 1080, 16, 27
    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 15) // 16, (W + 15) // 16)
    cfg = StreamConfig(width=W, height=H, qp=QP, tile_cols=tc, tile_rows=tr,
                       inter=True, bframes=True)
    enc = GopEncoder(cfg)
    sched = b_schedule(F, 30, True)
    groups = chunk_groups(sched, True, 8)
    t0 = time.time()
    for grp in groups:
        enc.encode_chunk_async([frames[e[0]] for e in grp],
                               [e[1:] for e in grp], chunk=8).result()
    log(f"compile+first: {time.time()-t0:.1f}s")

    iters = 3
    t0 = time.time()
    n = 0
    for it in range(iters):
        enc.reset()
        pending = deque()
        for grp, fut in enc.encode_groups_pipelined(frames, groups, chunk=8):
            pending.append(fut)
            n += len(grp)
            while len(pending) > 2:
                tw = time.perf_counter()
                pending.popleft().result()
                GLOBAL_TIMERS.add("drain_wait", time.perf_counter() - tw)
        while pending:
            tw = time.perf_counter()
            pending.popleft().result()
            GLOBAL_TIMERS.add("drain_wait", time.perf_counter() - tw)
    wall = time.time() - t0
    log(f"pipelined: {wall/n*1000:.1f} ms/frame = {n/wall:.2f} fps")
    log(json.dumps(GLOBAL_TIMERS.summary(), indent=1))
    return True


def phase_diag():
    """Ground-truth per-dispatch costs on the tunnel: RPC overhead,
    upload/fetch rates, and each production dispatch timed in isolation."""
    log("=== phase: diag ===")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from generate_test_videos import synth_frame
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import GopEncoder, b_schedule, chunk_groups
    from hevc_tpu.entropy.headers import StreamConfig

    W, H, F, QP = 1920, 1080, 16, 27
    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 15) // 16, (W + 15) // 16)
    cfg = StreamConfig(width=W, height=H, qp=QP, tile_cols=tc, tile_rows=tr,
                       inter=True, bframes=True)
    enc = GopEncoder(cfg)
    sched = b_schedule(F, 30, True)
    groups = chunk_groups(sched, True, 8)
    for grp in groups:          # warm/compile + build DPB state
        enc.encode_chunk_async([frames[e[0]] for e in grp],
                               [e[1:] for e in grp], chunk=8).result()

    # tiny jit call = pure RPC overhead
    f_tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    jax.block_until_ready(f_tiny(x))
    for name, fn in (("tiny_jit", lambda: jax.block_until_ready(f_tiny(x))),):
        t0 = time.time()
        for _ in range(10):
            fn()
        log(f"[diag] {name}: {(time.time()-t0)*100:.1f} ms/call")

    # upload 25 MB flat
    buf = np.zeros(25 << 20, np.uint8)
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(jnp.asarray(buf))
    log(f"[diag] 25MB flat upload: {(time.time()-t0)/3*1000:.0f} ms")

    # fetch 1 MB
    dv = jnp.zeros(1 << 20, jnp.uint8) + 1
    jax.block_until_ready(dv)
    t0 = time.time()
    for _ in range(3):
        np.asarray(dv)
    log(f"[diag] 1MB fetch: {(time.time()-t0)/3*1000:.0f} ms")

    # one steady-state group, each dispatch blocked-until-ready in turn
    from hevc_tpu.utils.metrics import GLOBAL_TIMERS
    grp = groups[0]
    staged = enc.stage_chunk([frames[e[0]] for e in grp],
                             [e[1:] for e in grp], 8)
    import hevc_tpu.encoder.gop as G
    orig_gop = G._gop_chunk_jit
    orig_b = G._b_batch_jit

    def timed_gop(*a, **k):
        t0 = time.time()
        out = orig_gop(*a, **k)
        jax.block_until_ready(out)
        log(f"[diag] gop_chunk blocked: {(time.time()-t0)*1000:.0f} ms")
        return out

    def timed_b(*a, **k):
        t0 = time.time()
        out = orig_b(*a, **k)
        jax.block_until_ready(out)
        log(f"[diag] b_batch blocked: {(time.time()-t0)*1000:.0f} ms")
        return out

    G._gop_chunk_jit = timed_gop
    G._b_batch_jit = timed_b
    t0 = time.time()
    enc.encode_chunk_async([frames[e[0]] for e in grp],
                           [e[1:] for e in grp], chunk=8,
                           staged=staged).result()
    log(f"[diag] whole group (serial, blocked): {(time.time()-t0)*1000:.0f}"
        " ms")
    G._gop_chunk_jit = orig_gop
    G._b_batch_jit = orig_b
    return True


def phase_bench():
    log("=== phase: bench ===")
    import bench
    bench.main()
    return True


def phase_ctb32():
    """Validate the production ctb32 path on device: tiled small clip,
    stream identical to the numpy spec, decode-back in libavcodec."""
    log("=== phase: ctb32 ===")
    import numpy as np
    from generate_test_videos import synth_frame_kind
    from hevc_tpu.encoder.ctb32_ref import Ctb32RefEncoder, \
        make_ctb32_config
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder
    from hevc_tpu.validate import avref

    W, H, QP, F = 128, 64, 27, 5          # 2 x 1 tile grid forced below
    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame_kind(W, H, t, "mixed"))
              for t in range(F)]
    cfg = make_ctb32_config(width=W, height=H, qp=QP, inter=True,
                            tile_cols=2, tile_rows=1, bframes=True,
                            sdh=True)
    sn, rn = Ctb32RefEncoder(cfg).encode_video(frames, gop=0)
    sd = Ctb32GopEncoder(cfg).encode_video(frames, gop=0)
    log("ctb32 prod stream:",
        "IDENTICAL" if sn == sd else f"DIFFER {len(sn)} vs {len(sd)}")
    ref = avref.decode_hevc(sd)
    ok = all(np.array_equal(a[0].astype(np.int32), r["y"][:H, :W])
             for a, r in zip(ref, rn))
    log("ctb32 prod decode-back:", "OK" if ok else "BAD")
    return sn == sd and ok


def phase_bd():
    """BD-rate harness: production path vs libx265-medium, multi-content."""
    log("=== phase: bd ===")
    sys.path.insert(0, "tools")
    from quality_report import run_bd
    summary = run_bd(1280, 720, 16, qps=(22, 27, 32, 37),
                     crfs=(18, 23, 28, 33), kinds=("mixed", "pan", "detail"))
    log("BD summary:", json.dumps(summary))
    return True


def phase_bd32():
    """BD-rate harness on the ctb32 preset path (IbPbP + SDH)."""
    log("=== phase: bd32 ===")
    sys.path.insert(0, "tools")
    from quality_report import run_bd
    summary = run_bd(1280, 720, 16, qps=(22, 27, 32, 37),
                     crfs=(18, 23, 28, 33), kinds=("mixed", "pan", "detail"),
                     encoder="ctb32")
    log("BD32 summary:", json.dumps(summary))
    return True


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    t0 = time.time()
    log("devices:", jax.devices(), f"({time.time()-t0:.1f}s)")
    ok = True
    for ph in (sys.argv[1:] or ["verify", "profile", "bench"]):
        ok = globals()[f"phase_{ph}"]() and ok
    log("session done, ok =", ok)


if __name__ == "__main__":
    main()
