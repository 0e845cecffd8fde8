"""Smooth rank measure — SVD-entropy effective rank of an embedding matrix.

The reference uses this as its model-selection metric (checkpoint saved when the
train-time rank improves after epoch 20, ref: bin/pretrain.py:69-72) and as an
eval diagnostic (ref: madeleine/utils/utils.py:180-201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_rank_measure(embedding_matrix: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """exp(entropy of L1-normalized singular values) (ref: utils.py:180-201).

    embedding_matrix: [n, m]. Returns a scalar (fp32). The reference truncates
    the normalized spectrum to the first m entries (p = p[:m]); torch.svd
    already returns min(n, m) singular values, so the slice only matters when
    n < m — we reproduce it exactly.
    """
    x = embedding_matrix.astype(jnp.float32)
    s = jnp.linalg.svd(x, compute_uv=False)
    p = s / jnp.linalg.norm(s, ord=1) + eps
    p = p[: x.shape[1]]
    return jnp.exp(-jnp.sum(p * jnp.log(p)))


@jax.jit
def smooth_rank_measure_jit(embedding_matrix: jnp.ndarray) -> jnp.ndarray:
    return smooth_rank_measure(embedding_matrix)
