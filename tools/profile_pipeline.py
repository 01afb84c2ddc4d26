"""Profile the production pipelined loop stage by stage.

Runs the same 1080p medium-path loop bench.py times, then dumps
GLOBAL_TIMERS so the wall-clock gap between device-only fps and
end-to-end fps is attributable (stage prep/upload, dispatch blocking,
fetch, entropy).  Usage:

    python tools/profile_pipeline.py [W H F QP iters]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    W, H, F, QP, iters = 1920, 1080, 16, 27, 2
    args = sys.argv[1:]
    if len(args) >= 4:
        W, H, F, QP = map(int, args[:4])
    if len(args) >= 5:
        iters = int(args[4])
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    print("devices:", jax.devices(), file=sys.stderr)
    sys.path.insert(0, "tests")
    from generate_test_videos import synth_frame

    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import GopEncoder, b_schedule, chunk_groups
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.utils.metrics import GLOBAL_TIMERS

    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 15) // 16, (W + 15) // 16)
    cfg = StreamConfig(width=W, height=H, qp=QP, tile_cols=tc, tile_rows=tr,
                       inter=True, bframes=True, sao=True, sdh=True,
                       weightp=True, bframes_n=2)
    enc = GopEncoder(cfg)

    sched = b_schedule(F, 30, cfg.bframes, cfg.bframes_n)
    groups = chunk_groups(sched, cfg.bframes, 8)

    # warm/compile pass (uncounted)
    from collections import deque
    enc.reset()
    for grp, fut in enc.encode_groups_pipelined(frames, groups, chunk=8):
        fut.result()

    # reset timers, then measure
    GLOBAL_TIMERS._total.clear()
    GLOBAL_TIMERS._count.clear()
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
                pending.popleft().result()
        while pending:
            pending.popleft().result()
    wall = time.time() - t0
    print(f"wall: {wall:.2f}s for {n} frames = {wall/n*1000:.1f} ms/f "
          f"= {n/wall:.2f} fps", file=sys.stderr)
    summ = GLOBAL_TIMERS.summary()
    ngroups = iters * len(groups)
    for k, v in summ.items():
        v["per_group_ms"] = round(1000 * v["total_s"] / ngroups, 1)
        v["per_frame_ms"] = round(1000 * v["total_s"] / n, 1)
    print(json.dumps({"wall_s": round(wall, 2), "frames": n,
                      "groups": ngroups, "fps": round(n / wall, 3),
                      "stages": summ}, indent=1))


if __name__ == "__main__":
    main()
