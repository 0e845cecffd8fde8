"""Device mesh helpers — the DataParallel replacement (SURVEY §2b).

The model is ~5M params, so the scale-out strategy is pure data parallelism:
params replicated, batch sharded on the leading axis, XLA collectives over ICI
(all-gather for the global-batch contrastive logits, psum for grads). Bags too
large for one chip can additionally shard the token axis (context-parallel
analog) — see `bag_sharding`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
BAG_AXIS = "bag"


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = (DATA_AXIS,),
              devices=None) -> Mesh:
    """1-D data mesh by default; pass axis_names=("data", "bag") with a 2-D
    n_devices factorization for bag (context) parallelism."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if isinstance(n_devices, int):
        shape = (n_devices,) if len(axis_names) == 1 else None
        if shape is None:
            raise ValueError("multi-axis mesh needs an explicit shape tuple")
    else:
        shape = tuple(n_devices)
    total = int(np.prod(shape))
    mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices[:total])
    return Mesh(mesh_devices, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def bag_sharding(mesh: Mesh) -> NamedSharding:
    """[b, t, d] with tokens sharded over the bag axis (and batch over data if
    present) — the sequence-parallel layout for giant bags."""
    if BAG_AXIS in mesh.axis_names and DATA_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, BAG_AXIS, None))
    return NamedSharding(mesh, P(None, BAG_AXIS, None))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put batch leaves with leading-axis sharding."""
    ds = data_sharded(mesh)
    return {k: jax.device_put(v, ds) if hasattr(v, "shape") else v
            for k, v in batch.items()}
