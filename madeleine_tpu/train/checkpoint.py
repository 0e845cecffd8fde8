"""Checkpointing — orbax-native with full resume, plus torch export.

The reference only ever saves a bare ``state_dict`` on rank improvement and has
no resume path (optimizer/scheduler/epoch state is lost on crash, ref:
bin/pretrain.py:69-72, SURVEY §5). Here:

- `save_train_state` / `restore_train_state`: full training state (params,
  optimizer state, step/epoch, best rank, data-order rng) via orbax — crash
  recovery resumes exactly.
- `save_best_torch` also exports a reference-compatible ``model.pt`` so the
  torch codebase can consume models trained here.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _ckptr() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, state: Dict[str, Any],
                     metadata: Optional[Dict[str, Any]] = None) -> None:
    """state: pytree of arrays (params, opt_state, ...); metadata: small json.

    Crash-safe: the new checkpoint is fully written to a sibling temp dir
    before any rename, so a crash mid-save never leaves a partial checkpoint
    at the primary path — the worst case is an intact previous checkpoint at
    either `directory` or `directory + ".old"` (restore checks both)."""
    import shutil

    directory = os.path.abspath(directory)
    tmp, old = directory + ".tmp", directory + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _ckptr().save(tmp, state)          # complete new checkpoint, off to the side
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(directory):
        os.rename(directory, old)      # previous checkpoint stays restorable
    os.rename(tmp, directory)          # atomic swap-in (same filesystem)
    if metadata is not None:
        meta_tmp = directory + ".meta.json.tmp"
        with open(meta_tmp, "w") as f:
            json.dump(metadata, f, indent=2)
        os.replace(meta_tmp, directory + ".meta.json")
    if os.path.exists(old):
        shutil.rmtree(old)


def restore_train_state(directory: str,
                        abstract_state: Optional[Dict[str, Any]] = None
                        ) -> Dict[str, Any]:
    directory = os.path.abspath(directory)
    abstract = None
    if abstract_state is not None:
        abstract = jax.tree.map(
            lambda x: ocp.utils.to_shape_dtype_struct(x)
            if hasattr(x, "shape") else x,
            abstract_state,
        )

    def _restore(path):
        if abstract is not None:
            return _ckptr().restore(path, item=abstract)
        return _ckptr().restore(path)

    try:
        return _restore(directory)
    except Exception:
        # a crash mid-save can leave the previous (intact) checkpoint parked
        # at .old — fall back to it rather than failing the resume
        old = directory + ".old"
        if os.path.isdir(old):
            return _restore(old)
        raise


def load_metadata(directory: str) -> Optional[Dict[str, Any]]:
    path = os.path.abspath(directory) + ".meta.json"
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def save_params(directory: str, params) -> None:
    save_train_state(directory, {"params": params})


def restore_params(directory: str):
    return restore_train_state(directory)["params"]


def save_best_torch(results_dir: str, params, cfg=None) -> str:
    """Write a reference-compatible model.pt (+ model_config.json when cfg is
    given) into the results dir (ref artifact layout: bin/pretrain.py:72,
    factory.py:23-28)."""
    from madeleine_tpu.models.factory import export_torch_checkpoint

    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, "model.pt")
    export_torch_checkpoint(params, path)
    if cfg is not None:
        with open(os.path.join(results_dir, "model_config.json"), "w") as f:
            json.dump(cfg.to_dict(), f, indent=4)
    return path
