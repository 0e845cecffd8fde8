"""Auxiliary head modules — MLP and ProjHead (ref: Model.py:218-312).

Defined-but-unused in the reference's main path; provided for API parity and
for downstream users who fine-tune heads on top of slide embeddings.
Block structure: [Linear -> LayerNorm -> ReLU -> Dropout(0.2)] x2 -> Linear
(MLP) and [Linear -> LayerNorm -> ReLU -> Dropout(0.2) -> Linear] (ProjHead).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from madeleine_tpu.models.abmil import (
    _dropout,
    _init_layernorm,
    _init_linear,
    dot_precision,
    layer_norm,
)

Params = Dict[str, Any]

HEAD_DROPOUT = 0.2  # ref: Model.py:261,297


def init_mlp_params(rng, input_dim: int, output_dim: int,
                    dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "fc1": _init_linear(k1, input_dim, input_dim, dtype),
        "ln1": _init_layernorm(input_dim, dtype),
        "fc2": _init_linear(k2, input_dim, input_dim, dtype),
        "ln2": _init_layernorm(input_dim, dtype),
        "out": _init_linear(k3, input_dim, output_dim, dtype),
    }


def mlp_forward(params: Params, x: jnp.ndarray, *, rng=None,
                train: bool = False) -> jnp.ndarray:
    """(ref: Model.py:239-276)."""
    prec = dot_precision(x.dtype)
    rngs = jax.random.split(rng, 2) if (train and rng is not None) else (None, None)
    for i, r in zip((1, 2), rngs):
        x = jnp.dot(x, params[f"fc{i}"]["w"], precision=prec) + params[f"fc{i}"]["b"]
        x = layer_norm(x, params[f"ln{i}"])
        x = jax.nn.relu(x)
        if r is not None:
            x = _dropout(x, HEAD_DROPOUT, r)
    return jnp.dot(x, params["out"]["w"], precision=prec) + params["out"]["b"]


def init_proj_head_params(rng, input_dim: int, output_dim: int,
                          dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": _init_linear(k1, input_dim, input_dim, dtype),
        "ln1": _init_layernorm(input_dim, dtype),
        "out": _init_linear(k2, input_dim, output_dim, dtype),
    }


def proj_head_forward(params: Params, x: jnp.ndarray, *, rng=None,
                      train: bool = False) -> jnp.ndarray:
    """(ref: Model.py:279-312)."""
    prec = dot_precision(x.dtype)
    x = jnp.dot(x, params["fc1"]["w"], precision=prec) + params["fc1"]["b"]
    x = layer_norm(x, params["ln1"])
    x = jax.nn.relu(x)
    if train and rng is not None:
        x = _dropout(x, HEAD_DROPOUT, rng)
    return jnp.dot(x, params["out"]["w"], precision=prec) + params["out"]["b"]
