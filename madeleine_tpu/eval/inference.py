"""Slide-embedding inference driver (ref: madeleine/utils/utils.py:27-90).

TPU redesign: instead of a bs=1 python loop per slide, bags stream through
`BucketedBagLoader` as padded/masked batches and one jitted encode function
serves all bucket shapes (XLA caches one executable per shape). Host IO is
overlapped with device compute via the threaded Prefetcher.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from madeleine_tpu.config import MadeleineConfig, compute_dtype
from madeleine_tpu.data.datasets import BucketedBagLoader, Prefetcher
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.ops.rank import smooth_rank_measure
from madeleine_tpu.utils.file_utils import save_pkl


@functools.partial(jax.jit, static_argnames=("cfg", "stain_idx"))
def _encode_jit(params, feats, mask, *, cfg: "HashableCfg", stain_idx: int):
    return mtm.encode(params, cfg.cfg, feats, stain_idx=stain_idx, mask=mask)


from madeleine_tpu.utils.cache import LruCache

_MESH_ENCODE_CACHE = LruCache(maxsize=16)


def _encode_sharded(params, feats, mask, *, cfg: "HashableCfg",
                    stain_idx: int, mesh):
    """Data-parallel encode: batch sharded over the mesh, params replicated
    (XLA partitions the whole encoder; no collectives needed until the
    gathered output)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _build():
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            lambda p, f, m: mtm.encode(p, cfg.cfg, f, stain_idx=stain_idx,
                                       mask=m),
            in_shardings=(repl, data, data), out_shardings=data)

    fn = _MESH_ENCODE_CACHE.get_or_create((cfg, stain_idx, mesh), _build)
    data = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    feats = jax.device_put(feats, data)
    mask = jax.device_put(mask, data)
    return fn(params, feats, mask)


class HashableCfg:
    """Static-arg wrapper: configs hash by CONTENT, so repeated calls with
    equal (even freshly constructed) configs hit the same jit executable —
    identity hashing re-traced every `run_inference` call."""

    def __init__(self, cfg: MadeleineConfig):
        from madeleine_tpu.config import config_cache_key

        self.cfg = cfg
        self._key = config_cache_key(cfg)

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, HashableCfg) and other._key == self._key


def run_inference(
    params,
    cfg: MadeleineConfig,
    loader,
    *,
    stain_idx: int = 0,
    dtype=None,
    mesh=None,
    verbose: bool = True,
) -> Tuple[Dict, float]:
    """Encode every bag the loader yields -> ({"embeds", "slide_ids"}, rank)
    (ref: utils.py:27-66). Pass a mesh to shard batches over all devices
    (batch-dim sizes from the bucketed loader are powers of two, so they
    divide any power-of-two mesh)."""
    dtype = dtype or compute_dtype(cfg.precision)
    hcfg = HashableCfg(cfg)
    pending, all_ids = [], []
    n_done, t0 = 0, time.time()
    # dispatch the whole stream asynchronously — fetching each batch's
    # embeddings immediately would serialize host->device transfers with
    # compute; embeddings are tiny, so holding them on device is free
    for batch in Prefetcher(loader):
        feats = jnp.asarray(batch["feats"], dtype)
        mask = jnp.asarray(batch["mask"])
        if mesh is not None and feats.shape[0] % mesh.size == 0:
            emb = _encode_sharded(params, feats, mask, cfg=hcfg,
                                  stain_idx=stain_idx, mesh=mesh)
        else:
            emb = _encode_jit(params, feats, mask, cfg=hcfg,
                              stain_idx=stain_idx)
        n_valid = batch.get("n_valid", len(batch["slide_ids"]))
        pending.append((emb.astype(jnp.float32), n_valid))
        all_ids.extend(batch["slide_ids"])
        n_done += n_valid
    all_embeds = [np.asarray(emb)[:n_valid] for emb, n_valid in pending]
    elapsed = time.time() - t0
    embeds = np.concatenate(all_embeds, axis=0) if all_embeds else np.zeros((0, cfg.embed_dim))
    rank = float(smooth_rank_measure(jnp.asarray(embeds))) if len(embeds) > 1 else 0.0
    if verbose:
        print(f"* Encoded {n_done} slides in {elapsed:.2f}s "
              f"({n_done / max(elapsed, 1e-9):.1f} slides/sec), rank={rank:.2f}")
    return {"embeds": embeds, "slide_ids": all_ids}, rank


def get_downstream_loader(path: str, buckets=None,
                          tokens_per_batch: int = 262144) -> BucketedBagLoader:
    """Loader over ``<path>/patch_embeddings`` bag files
    (ref: bin/extract_slide_embeddings.py:21-29)."""
    feat_dir = os.path.join(path, "patch_embeddings")
    if not os.path.isdir(feat_dir):
        feat_dir = path
    kwargs = {}
    if buckets is not None:
        kwargs["buckets"] = buckets
    return BucketedBagLoader(feat_dir, tokens_per_batch=tokens_per_batch, **kwargs)


def extract_slide_level_embeddings(
    params, cfg: MadeleineConfig, val_loaders: Dict[str, BucketedBagLoader],
    save_dir: Optional[str] = None,
) -> Dict[str, Dict]:
    """Loop datasets -> {name}.pkl results dicts (ref: utils.py:68-90)."""
    results = {}
    for name, loader in val_loaders.items():
        print(f"\n* Extracting slide-level embeddings of {name}")
        res, rank = run_inference(params, cfg, loader)
        print(f"Rank for {name} = {rank}")
        results[name] = res
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            save_pkl(os.path.join(save_dir, f"{name}.pkl"), res)
    return results
