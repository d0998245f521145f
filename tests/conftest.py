"""Test configuration: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (mirrors the driver's dryrun_multichip environment)."""

import os

# NOTE: the axon TPU plugin pins JAX_PLATFORMS=axon at interpreter start, so we
# must override via JAX_PLATFORM_NAME + jax.config rather than JAX_PLATFORMS.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: jit compiles dominate suite wall time; cached reruns
# cut the fast tier by minutes. Safe on CPU (keyed by HLO + flags).
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
