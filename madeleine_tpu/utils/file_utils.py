"""Small file helpers (ref: madeleine/utils/file_utils.py:4-38).

pkl schema compatibility matters: downstream linear probing reads
``{"embeds": np.ndarray, "slide_ids": list}`` pickles
(ref: bin/run_linear_probing.py:71-81).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_pkl(filename: str, save_object: Any) -> None:
    with open(filename, "wb") as f:
        pickle.dump(save_object, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_pkl(filename: str) -> Any:
    with open(filename, "rb") as f:
        return pickle.load(f)


def print_network(params: Any, cfg: Any = None, results_dir: str | None = None) -> str:
    """Write a human-readable model summary + parameter counts
    (ref: file_utils.py:17-38 writes model_config.txt)."""
    lines = []
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        lines.append(f"{name}: shape={tuple(leaf.shape)} dtype={leaf.dtype}")
        total += int(np.prod(leaf.shape))
    lines.append(f"Total number of parameters: {total}")
    lines.append(f"Total number of trainable parameters: {total}")
    text = "\n".join(lines)
    if results_dir is not None:
        os.makedirs(results_dir, exist_ok=True)
        with open(os.path.join(results_dir, "model_config.txt"), "w") as f:
            if cfg is not None:
                f.write(str(cfg) + "\n\n")
            f.write(text + "\n")
    return text
