"""Backend selection helper.

The axon TPU plugin ignores ``JAX_PLATFORMS``; the only reliable override is
``jax.config.update("jax_platforms", ...)`` before backend initialization.
CLI entry points call `apply_platform_env()` first so
``MADELEINE_TPU_PLATFORM=cpu python bin/pretrain.py ...`` works for CPU debug
runs and tests.
"""

from __future__ import annotations

import os

ENV_VAR = "MADELEINE_TPU_PLATFORM"
CACHE_ENV_VAR = "MADELEINE_TPU_COMPILE_CACHE"


def apply_platform_env() -> None:
    plat = os.environ.get(ENV_VAR)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    enable_compilation_cache()


def enable_compilation_cache() -> None:
    """Persistent on-disk XLA/Mosaic compilation cache. The fused train
    kernels compile in minutes (large unrolled Mosaic programs); caching makes
    every CLI invocation after the first start in seconds. Opt out with
    MADELEINE_TPU_COMPILE_CACHE=off; override the dir by setting it to a path."""
    val = os.environ.get(CACHE_ENV_VAR, "")
    if val.lower() in ("off", "0", "none"):
        return
    cache_dir = val or os.path.join(
        os.path.expanduser("~"), ".cache", "madeleine_tpu", "xla_cache")
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
