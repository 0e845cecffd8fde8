"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so mesh-sharding/collective paths
are exercised without TPU hardware (SURVEY §4 test-strategy plan). This must
run before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; the config knob is authoritative.
jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def _reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "madeleine"))


@pytest.fixture(scope="session")
def reference_models():
    """Import the reference torch model package (read-only) for golden parity
    checks. Skips cleanly when the reference checkout is absent."""
    if not _reference_available():
        pytest.skip("reference checkout not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # reference utils.py imports wandb unconditionally; stub it when absent
    try:
        import wandb  # noqa: F401
    except ImportError:
        import types

        sys.modules["wandb"] = types.ModuleType("wandb")
    import torch  # noqa: F401

    # The reference loss module hardcodes .cuda() (ref: loss.py:182-184 etc.);
    # neutralize it so golden values can be produced on CPU.
    import torch as _torch

    if not getattr(_torch.Tensor, "_cuda_patched", False):
        _torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
        _torch.Tensor._cuda_patched = True  # type: ignore[attr-defined]

    from madeleine.models import Model as ref_model  # noqa: F401
    from madeleine.utils import loss as ref_loss  # noqa: F401

    return ref_model, ref_loss


@pytest.fixture()
def rng_np():
    return np.random.default_rng(0)
