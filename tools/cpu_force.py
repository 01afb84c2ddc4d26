"""Import FIRST in any script that must stay off the TPU tunnel.

The axon plugin ignores JAX_PLATFORMS=cpu alone (see tests/conftest.py);
attaching a second client wedges the tunnel for ~10+ minutes.  Set both
env vars AND the config flag before anything else touches jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass
