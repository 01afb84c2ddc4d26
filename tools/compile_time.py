"""Measure XLA compile time of the ctb32 production step variants at a
given geometry (default: the 1080p bench geometry, 6x17 tile lanes).

Usage: python tools/compile_time.py [idr|p|b|all] [--nocache]
Prints per-variant lower/compile wall seconds to stderr.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp
    if "--cache" in sys.argv:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    print("devices:", jax.devices(), file=sys.stderr)

    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop32 import (Ctb32GopEncoder, make_ctb32_config,
                                        _gop32_step_jit, _gop32_step_b_jit,
                                        Ctb32PackSpec)
    from hevc_tpu.encoder.rowscan_v1 import (MARGIN, MARGIN_C,
                                             RowScanEncoderV1)
    from hevc_tpu.encoder.ctu_modes import skip_lambda16

    W, H, QP = 1920, 1080, 27
    Hp = (H + 31) // 32 * 32
    tc, tr = pick_tile_grid(Hp // 32, W // 32, ctb=32)
    print(f"tile grid: {tc}x{tr}", file=sys.stderr)
    cfg = make_ctb32_config(width=W, height=H, qp=QP, tile_cols=tc,
                            tile_rows=tr, inter=True, bframes=True,
                            sdh=True, sao=True, weightp=True, bframes_n=2)
    T = tr * tc
    tnh32, tnw32 = Hp // 32 // tr, W // 32 // tc
    th, tw = Hp // tr, W // tc
    flat = jnp.zeros(Hp * W * 3 // 2, jnp.uint8)
    pads = (jnp.zeros((T, th + 2 * MARGIN, tw + 2 * MARGIN), jnp.int32),
            jnp.zeros((T, th // 2 + 2 * MARGIN_C, tw // 2 + 2 * MARGIN_C),
                      jnp.int32),
            jnp.zeros((T, th // 2 + 2 * MARGIN_C, tw // 2 + 2 * MARGIN_C),
                      jnp.int32))
    rs = RowScanEncoderV1(QP, 8)
    lam16 = jnp.asarray(skip_lambda16(QP), jnp.int32)
    sl16 = jnp.asarray(int(np.sqrt(0.85 * 2.0 ** ((QP - 12) / 3.0)) * 16),
                       jnp.int32)
    wp_v = jnp.asarray((64, 0, 64, 0, 64, 0), jnp.int32)
    spec = Ctb32PackSpec(tnh32, tnw32, T, sao=True)
    cap = min(65536, spec.coef_elems // 2)

    def timeit(name, fn, *args, **kw):
        t0 = time.time()
        lowered = fn.lower(*args, **kw)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        print(f"[{name}] lower {t1-t0:.1f}s  compile {t2-t1:.1f}s",
              file=sys.stderr, flush=True)
        return compiled

    if which in ("idr", "all"):
        timeit("idr", _gop32_step_jit, flat, *pads, jnp.asarray(QP),
               rs.lam_bits, lam16, sl16, tnh32, tnw32, tr, tc, 8, True,
               True, True, cfg.sdh, cfg.rdoq, cfg.sao, cap,
               weightp=cfg.weightp, wp=wp_v, hc=H, wc=W)
    if which in ("p", "all"):
        timeit("p", _gop32_step_jit, flat, *pads, jnp.asarray(QP),
               rs.lam_bits, lam16, sl16, tnh32, tnw32, tr, tc, 8, False,
               True, True, cfg.sdh, cfg.rdoq, cfg.sao, cap,
               weightp=cfg.weightp, wp=wp_v, hc=H, wc=W)
    if which in ("b", "all"):
        from hevc_tpu.encoder.rowscan_v1 import dsf_pair
        timeit("b", _gop32_step_b_jit, flat, *pads, *pads,
               jnp.asarray(dsf_pair(1, 0, 2)), jnp.asarray(QP + 3),
               rs.lam_bits, lam16, sl16, tnh32, tnw32, tr, tc, 8, True,
               cfg.sdh, cfg.rdoq, cap)


if __name__ == "__main__":
    main()
