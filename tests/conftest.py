import os
import sys

# Force CPU with a virtual 8-device mesh BEFORE jax import (multi-chip tests).
# NOTE: the axon TPU plugin ignores JAX_PLATFORMS alone; set both env vars and
# the config flag (the latter is what actually sticks with jax 0.9 + axon).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    import jax
    jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: repeat runs skip the expensive CPU
    # compiles of the fused GOP/rowscan graphs
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except ImportError:
    pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy tests (run with -m slow or no -m)")
