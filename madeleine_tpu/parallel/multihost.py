"""Multi-host (DCN) runtime — one chip x N hosts pod deployments (SURVEY §2b).

The reference is single-node DataParallel only (ref: setup_components.py:185-187);
this module makes the SAME training program run across hosts:

- `initialize_from_env()`: gated `jax.distributed.initialize` — TPU pods
  auto-detect; explicit coordinator env vars cover CPU simulation and
  non-TPU fabrics.
- loaders shard each GLOBAL batch into per-host contiguous row blocks (see
  `local_rows`); every host computes the same global shuffle from the shared
  (seed, epoch), so no cross-host coordination is needed for data order;
- `global_batch()` assembles the hosts' local rows into one global
  jax.Array per leaf via `jax.make_array_from_process_local_data` — XLA's
  SPMD partitioner then runs the identical train step, with grad psums and
  contrastive all-gathers riding ICI/DCN;
- `allgather_rows()` reassembles host-local epoch outputs (e.g. HE embeddings
  for the smooth-rank metric) into the global, single-host-identical order.

Env contract (any one triggers init):
  MADELEINE_MULTIHOST=1                 auto-detect (TPU pod metadata)
  JAX_COORDINATOR_ADDRESS=host:port     explicit coordinator; then
  JAX_NUM_PROCESSES / JAX_PROCESS_ID    complete the explicit spec
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

_INITIALIZED = False


def initialize_from_env(verbose: bool = True) -> bool:
    """Call jax.distributed.initialize when the env asks for it (no-op and
    False otherwise). Must run before the first device access."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    want = coord or os.environ.get("MADELEINE_MULTIHOST") == "1"
    if not want:
        return False
    import jax

    kwargs = {}
    if coord:
        kwargs["coordinator_address"] = coord
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    if verbose:
        print(f"* jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")
    return True


def process_info() -> tuple:
    import jax

    return jax.process_index(), jax.process_count()


def local_rows(global_bs: int, process_index: int, process_count: int) -> slice:
    """Contiguous per-host row block of a global batch. Matches the row ->
    device mapping of a 1-D "data" mesh over jax.devices() (devices are
    ordered by process), so `make_array_from_process_local_data` places each
    host's rows on its own chips — zero cross-host data movement at load."""
    if global_bs % process_count != 0:
        raise ValueError(f"global batch {global_bs} not divisible by "
                         f"{process_count} processes")
    lbs = global_bs // process_count
    return slice(process_index * lbs, (process_index + 1) * lbs)


def global_batch(mesh, local_batch: Dict[str, np.ndarray]) -> Dict:
    """Host-local numpy rows -> global batch-sharded jax.Arrays."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    ds = NamedSharding(mesh, P("data"))
    return {k: jax.make_array_from_process_local_data(ds, np.asarray(v))
            for k, v in local_batch.items()}


def allgather_rows(local: np.ndarray) -> np.ndarray:
    """Concatenate per-host row blocks in process order (the inverse of
    `local_rows`); identity when single-process."""
    import jax

    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(local, tiled=True))


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
