"""Determinism helpers (ref: madeleine/utils/utils.py:147-177).

JAX is deterministic by construction (explicit PRNG keys); this seeds the
host-side RNGs that the data pipeline and sklearn probing rely on, mirroring
the reference's `set_deterministic_mode` (numpy / random / torch when present).
"""

from __future__ import annotations

import random

import numpy as np


def set_deterministic_mode(seed: int) -> np.random.Generator:
    """Seed host RNGs; returns a fresh numpy Generator for pipeline use."""
    random.seed(seed)
    np.random.seed(seed)
    try:  # torch only matters if the interop bridge is in use
        import torch
        torch.manual_seed(seed)
    except Exception:
        pass
    return np.random.default_rng(seed)
