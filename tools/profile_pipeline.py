"""Profile the chunked production loop: where does non-device time go?

Instruments encode_chunk_async's dispatch side (host prep, flat upload,
device dispatch) and the worker side (fetch wait, unpack, entropy), then
runs the same pipelined loop bench.py measures.  Run on the real TPU.
"""
from __future__ import annotations

import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    print("devices:", jax.devices(), file=sys.stderr)
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

    # warm-up/compile
    t0 = time.time()
    for grp in groups:
        enc.encode_chunk_async([frames[e[0]] for e in grp],
                               [e[1:] for e in grp], chunk=8).result()
    print(f"compile+first: {time.time()-t0:.1f}s", file=sys.stderr)

    # timed: per-call dispatch-side breakdown
    orig = GopEncoder.encode_chunk_async

    def timed(self, frames_, metas, qp=None, chunk=8, staged=None):
        t0 = time.perf_counter()
        fut = orig(self, frames_, metas, qp=qp, chunk=chunk, staged=staged)
        GLOBAL_TIMERS.add("dispatch_side", time.perf_counter() - t0)
        return fut

    GopEncoder.encode_chunk_async = timed

    iters = 3
    t0 = time.time()
    n = 0
    for it in range(iters):
        enc.reset()
        pending = deque()
        for grp, fut in enc.encode_groups_pipelined(frames, groups,
                                                    chunk=8):
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
    print(f"pipelined: {wall/n*1000:.1f} ms/frame = {n/wall:.2f} fps",
          file=sys.stderr)
    import json
    print(json.dumps(GLOBAL_TIMERS.summary(), indent=1), file=sys.stderr)


if __name__ == "__main__":
    main()
