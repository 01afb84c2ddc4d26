"""Per-stage profile of the ctb32 flagship at 1080p on the real chip.

Buckets the 303 ms/frame (BENCH_r04) into: host prep (pad+upload),
device step (block_until_ready on the dispatch), wire fetch
(device_get), head unpack + coef scatter, entropy (C++ CABAC), and the
weightp host analysis.  Run with the pipeline DISABLED (synchronous) so
each bucket is attributable; the pipelined number overlaps them.

Usage: python tools/profile_gop32.py [W H F QP]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    W, H, F, QP = 1920, 1080, 12, 27
    if len(sys.argv) >= 5:
        W, H, F, QP = map(int, sys.argv[1:5])
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print("devices:", jax.devices(), file=sys.stderr)
    sys.path.insert(0, "tests")
    from generate_test_videos import synth_frame
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop32 import Ctb32GopEncoder, make_ctb32_config

    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 31) // 32, (W + 31) // 32, ctb=32)
    cfg = make_ctb32_config(width=W, height=H, qp=QP, tile_cols=tc,
                            tile_rows=tr, inter=True, bframes=True,
                            sdh=True, sao=True, weightp=True, bframes_n=2)
    enc = Ctb32GopEncoder(cfg)
    t0 = time.time()
    enc.warmup_parallel()
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    # --- synchronous, instrumented loop (monkeypatch the host stage) ---
    import hevc_tpu.encoder.gop32 as g32
    buckets = {}

    def add(k, dt):
        buckets[k] = buckets.get(k, 0.0) + dt

    # time the pieces manually by replicating encode_next_async inline
    from hevc_tpu.encoder.gop import b_schedule
    from hevc_tpu.entropy.headers import rps_sets
    sets = rps_sets(cfg)
    enc.reset()
    nf = 0
    wall0 = time.time()
    for disp, kind, poc, rps in b_schedule(F, 30, True, 2):
        fr = frames[disp]
        t0 = time.time()
        if kind == 2:
            neg, pos = sets[rps]
            fut = enc.encode_b_async(*fr, pocs=(poc, poc - neg[0],
                                                poc + pos[0]), rps_idx=rps)
        else:
            fut = enc.encode_next_async(*fr, idr=kind == 0, poc=poc,
                                        rps_idx=rps)
        add("dispatch(prep+trace)", time.time() - t0)
        t0 = time.time()
        jax.block_until_ready(enc._pads)
        add("device step", time.time() - t0)
        t0 = time.time()
        fut.result()
        add("host stage (fetch+unpack+entropy)", time.time() - t0)
        nf += 1
    wall = time.time() - wall0
    print(f"sync wall: {wall*1000/nf:.1f} ms/frame ({nf/wall:.2f} fps)",
          file=sys.stderr)
    for k, v in sorted(buckets.items(), key=lambda e: -e[1]):
        print(f"  {k}: {v*1000/nf:.1f} ms/frame", file=sys.stderr)

    # --- split the host stage further: fetch vs unpack vs entropy ---
    # rerun with the entropy call timed from inside the worker
    real_entropy = g32.entropy_encode_frame_ctb32
    tent = {}

    def timed_entropy(*a, **k):
        t0 = time.time()
        r = real_entropy(*a, **k)
        tent["entropy"] = tent.get("entropy", 0.0) + time.time() - t0
        tent["n"] = tent.get("n", 0) + 1
        return r

    g32.entropy_encode_frame_ctb32 = timed_entropy

    import hevc_tpu.encoder.pack as packmod
    real_split = packmod.split_coef_bitmap
    real_get = jax.device_get
    real_unpack = g32.Ctb32PackSpec.unpack_head
    real_toe = enc._to_entropy_arrays

    def timeit(key, fn):
        def wrap(*a, **k):
            t0 = time.time()
            r = fn(*a, **k)
            tent[key] = tent.get(key, 0.0) + time.time() - t0
            return r
        return wrap

    packmod.split_coef_bitmap = timeit("split_bitmap", real_split)
    jax.device_get = timeit("device_get", real_get)
    g32.Ctb32PackSpec.unpack_head = timeit("unpack_head", real_unpack)
    enc._to_entropy_arrays = timeit("to_entropy", real_toe)
    enc.reset()
    nf2 = 0
    t_all = time.time()
    for disp, kind, poc, rps in b_schedule(F, 30, True, 2):
        fr = frames[disp]
        if kind == 2:
            neg, pos = sets[rps]
            fut = enc.encode_b_async(*fr, pocs=(poc, poc - neg[0],
                                                poc + pos[0]), rps_idx=rps)
        else:
            fut = enc.encode_next_async(*fr, idr=kind == 0, poc=poc,
                                        rps_idx=rps)
        fut.result()
        nf2 += 1
    t_all = time.time() - t_all
    g32.entropy_encode_frame_ctb32 = real_entropy
    packmod.split_coef_bitmap = real_split
    jax.device_get = real_get
    g32.Ctb32PackSpec.unpack_head = real_unpack
    enc._to_entropy_arrays = real_toe
    n = max(tent.pop("n", 1), 1)
    print(f"host-stage split (over {n} frames, serial wall "
          f"{t_all*1000/nf2:.1f} ms/frame):", file=sys.stderr)
    for k, v in sorted(tent.items(), key=lambda e: -e[1]):
        print(f"  {k}: {v*1000/n:.1f} ms/frame", file=sys.stderr)

    # --- pipelined (the bench configuration) ---
    t0 = time.time()
    enc.encode_video(frames, gop=30)
    dt = time.time() - t0
    print(f"pipelined: {dt*1000/F:.1f} ms/frame = {F/dt:.2f} fps",
          file=sys.stderr)


if __name__ == "__main__":
    main()
