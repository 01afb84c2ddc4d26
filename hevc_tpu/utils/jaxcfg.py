"""Process-wide JAX configuration for the encode graphs.

The fused GOP/rowscan graphs take tens of seconds to compile per geometry;
the persistent compilation cache makes every run after the first start
instantly.  Called by the compile-heavy entry points (GopEncoder,
RowScanEncoderV1) so pure-host users (probe/planner) never import jax.
"""
from __future__ import annotations

import os

_done = False


def ensure_compile_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    try:
        import jax
        cache = os.environ.get("HEVC_TPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
