"""Runtime setup shared by the CLIs."""

from __future__ import annotations

import os
from pathlib import Path

import jax


def setup_compilation_cache():
    """Persistent XLA compilation cache — critical on remote-compile TPU
    backends where a cold compile of a deep 1000-step scan takes minutes;
    warm runs then start in seconds."""
    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        str(Path.home() / ".cache" / f"jax_duodiff_{backend}"),
    )
    try:
        if cache_dir in ("", "off"):
            # JAX_COMPILATION_CACHE_DIR=off (or empty) means DISABLE. JAX
            # itself reads the env var as a literal path default, so we must
            # both clear the config and drop the env var, or a relative
            # ./off directory gets created and silently used as a cache.
            os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
            jax.config.update("jax_compilation_cache_dir", None)
        else:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
