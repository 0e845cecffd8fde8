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


def apply_platform_env() -> None:
    plat = os.environ.get(ENV_VAR)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
