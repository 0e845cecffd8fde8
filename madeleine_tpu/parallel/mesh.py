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


def allgather_shapes(hlo_text: str):
    """All (dtype, element-count) results of all-gather ops in compiled HLO
    text. Used to PROVE the train step partitions: a pallas_call is opaque to
    GSPMD, and the failure mode is XLA silently all-gathering the sharded
    feats operand so every device computes the full global batch (round-4
    verdict). Legitimate all-gathers in the shard_map lane are the [B, e]
    embedding gathers for the global-batch InfoNCE — orders of magnitude
    smaller than a feats shard."""
    import re

    out = []
    for line in hlo_text.splitlines():
        if "all-gather" not in line or "=" not in line:
            continue
        lhs = line.split("=", 1)[1]
        op_pos = lhs.find("all-gather")
        if op_pos < 0:
            continue
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", lhs[:op_pos]):
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            out.append((dt, elems))
    return out


def assert_no_large_allgather(hlo_text: str, max_elems: int) -> None:
    """Assert no all-gather in `hlo_text` produces >= max_elems elements.
    Pass max_elems = one shard of the feats tensor: any all-gather at least
    that large means a bag-sized operand is being replicated."""
    big = [(dt, n) for dt, n in allgather_shapes(hlo_text) if n >= max_elems]
    if big:
        raise AssertionError(
            f"compiled HLO all-gathers bag-sized operands {big} "
            f"(threshold {max_elems} elements) — the train step is "
            f"replicating, not partitioning")
