"""Test bootstrap: run the suite on a virtual 8-device CPU mesh.

This gives multi-device sharding coverage the single-device reference never
had (SURVEY.md §4). The environment's sitecustomize may have already imported
jax and pinned JAX_PLATFORMS to a TPU plugin, so we must both set the env
vars AND update the live jax config (backends resolve lazily, so this works
as long as no array op has run yet).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this 1-CPU host makes the suite
# compile-bound (~18 min cold); warm reruns skip most XLA compiles.
from pathlib import Path  # noqa: E402

_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    str(Path.home() / ".cache" / "jax_duodiff_cpu_tests"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
