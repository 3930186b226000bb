"""Runtime configuration helpers.

``enable_compilation_cache`` turns on JAX's persistent compilation cache so
CLI invocations reuse compiled executables across processes — first
extraction compile is ~60 s; cached runs skip it entirely. Called by every
CLI entry point; opt out with VITTF_NO_COMPILE_CACHE=1.
"""
from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_CACHE = Path.home() / ".cache" / "vittf_tpu" / "jax"


def enable_compilation_cache(cache_dir: str | Path | None = None) -> Path | None:
    if os.environ.get("VITTF_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = Path(
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_CACHE
    )
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
