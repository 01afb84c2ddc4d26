"""Profile host entropy on real 1080p MC P decisions (VERDICT weak #2).

Breaks entropy_encode_frame_v1 into: binding copies, C++ encode, threading,
assemble. Run on the TPU host: python tools/profile_entropy.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from generate_test_videos import synth_frame
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import GopEncoder
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1
    from hevc_tpu.entropy import binding

    W, H, F, QP = 1920, 1080, 4, 27
    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(W, H, t))
              for t in range(F)]
    tc, tr = pick_tile_grid((H + 15) // 16, (W + 15) // 16)
    print(f"tile grid: {tc}x{tr} = {tc*tr} tiles; cpp={binding.available()}")
    cfg = StreamConfig(width=W, height=H, qp=QP, tile_cols=tc, tile_rows=tr,
                       inter=True)
    enc = GopEncoder(cfg)
    decs = []
    for i, f in enumerate(frames):
        enc.encode_next(*f, idr=(i == 0))
        decs.append(enc._last_dec)

    d = decs[-1]

    # full path timing
    for rep in range(3):
        t0 = time.time()
        for i, dd in enumerate(decs):
            entropy_encode_frame_v1(cfg, dd, poc=None if i == 0 else i)
        print(f"full entropy: {(time.time()-t0)/F*1000:.1f} ms/frame")

    # single-threaded C++ tile loop (no pool)
    from hevc_tpu.entropy import tiled_v1 as tv

    cols, rows = cfg.tile_grid()
    jobs = []
    y0 = 0
    k = 0
    total = len(cols) * len(rows)
    for th in rows:
        x0 = 0
        for tw in cols:
            k += 1
            jobs.append((y0, x0, th, tw, k == total))
            x0 += tw
        y0 += th

    t0 = time.time()
    for (y0_, x0_, th, tw, last) in jobs:
        binding.encode_tile_payload_v1(cfg.qp, d, y0_, x0_, th, tw, last,
                                       p_slice=True, bit_depth=8)
    t_serial = time.time() - t0
    print(f"serial C++ tiles: {t_serial*1000:.1f} ms/frame")

    # copies only (the Python-side slicing/ascontiguous work)
    t0 = time.time()
    for (y0_, x0_, th, tw, last) in jobs:
        sl = np.s_[y0_:y0_+th, x0_:x0_+tw]
        for key, dt in [("part_nxn", np.uint8), ("modes4", np.int32),
                        ("cbf_y4", np.uint8), ("cbf_cb", np.uint8),
                        ("cbf_cr", np.uint8), ("cbf_cb4", np.uint8),
                        ("cbf_cr4", np.uint8), ("lvl_y", np.int16),
                        ("lvl_cb", np.int16), ("lvl_cr", np.int16),
                        ("skip", np.uint8), ("inter", np.uint8),
                        ("merge", np.uint8), ("mvd", np.int16),
                        ("mvp", np.uint8), ("rqt", np.uint8),
                        ("cbf_yi", np.uint8), ("cbf_cbi", np.uint8),
                        ("cbf_cri", np.uint8)]:
            if key in d:
                np.ascontiguousarray(d[key][sl], dtype=dt)
    print(f"copies only: {(time.time()-t0)*1000:.1f} ms/frame")

    # threaded pool path (what production uses)
    import cProfile
    import pstats
    pr = cProfile.Profile()
    pr.enable()
    entropy_encode_frame_v1(cfg, d, poc=3)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(18)


if __name__ == "__main__":
    main()
