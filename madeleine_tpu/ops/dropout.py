"""Hardware-RNG dropout — Pallas kernel with mask regeneration in backward.

Training profile showed `jax.random.bernoulli` (threefry) over the ~5.5B
dropout sites of one canonical batch costing ~60% of the whole train step, and
its boolean masks living in the autodiff residuals (>1.3 GB). This kernel:

- draws bits from the TPU's hardware PRNG (`pltpu.prng_random_bits`), seeded
  per (call, block) — orders of magnitude cheaper than threefry; threshold
  masks come from the shared `ops/prng_mask.keep_mask` (8 bits/site when the
  block shape allows — see that module for the exact-mean scale rule);
- stores NOTHING for backward: the custom VJP re-seeds the same per-block
  streams and regenerates the identical mask to scale the cotangent (dropout
  is linear in x for a fixed mask).

Semantics match inverted dropout: keep with prob (1-rate), scale kept values by
1/(1-rate). Off-TPU (and under interpret-less CPU tests) it falls back to
jax.random.bernoulli with a key derived from the same seed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dropout_kernel(seed_ref, x_ref, o_ref, *, rate: float):
    # distinct stream per grid block; identical re-seed in backward.
    # Threshold-bit generation is shared with the fused train kernels
    # (ops/prng_mask.py): the PRNG is the bottleneck (~180 GB/s of bits), so
    # the mask uses 8 bits/site when the block shape allows.
    from madeleine_tpu.ops.prng_mask import keep_mask

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    mask = keep_mask(x_ref.shape, rate)
    o_ref[...] = (x_ref[...].astype(jnp.float32) * mask).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rate", "block_rows"))
def _dropout_pallas(x2d: jnp.ndarray, seed: jnp.ndarray, *, rate: float,
                    block_rows: int) -> jnp.ndarray:
    m, n = x2d.shape
    grid = (pl.cdiv(m, block_rows),)
    pad = grid[0] * block_rows - m
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_dropout_kernel, rate=rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
    )(seed.reshape(1), x2d)
    return out[:m] if pad else out


def _apply(x: jnp.ndarray, seed: jnp.ndarray, rate: float,
           block_rows: int) -> jnp.ndarray:
    shape = x.shape
    n = shape[-1]
    x2d = x.reshape(-1, n)
    out = _dropout_pallas(x2d, seed, rate=rate, block_rows=block_rows)
    return out.reshape(shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def hardware_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float,
                     block_rows: int = 512) -> jnp.ndarray:
    """Inverted dropout with TPU hardware RNG. seed: uint32/int32 scalar."""
    return _apply(x, seed, rate, block_rows)


def _hd_fwd(x, seed, rate, block_rows):
    return _apply(x, seed, rate, block_rows), seed


def _hd_bwd(rate, block_rows, seed, g):
    # same seeds -> identical mask; dropout is linear, so bwd = fwd(g)
    return _apply(g, seed, rate, block_rows), None


hardware_dropout.defvjp(_hd_fwd, _hd_bwd)


def dropout(x: jnp.ndarray, rate: float, rng,
            use_hardware: Optional[bool] = None,
            row_offset=None) -> jnp.ndarray:
    """Drop-in dropout: hardware kernel on TPU, jax.random elsewhere.
    `rng` is a jax PRNG key (the scalar seed is derived from it).

    row_offset: optional i32 scalar — the GLOBAL index of x's first
    leading-dim row. When given, the software branch draws each row's mask
    from fold_in(rng, global_row), so a sample's mask is invariant to how the
    batch is sharded (the shard_map data-parallel train lane passes
    axis_index * local_rows; the single-device lane passes 0 and produces
    bit-identical masks). The hardware branch folds the offset into the seed
    so shards draw decorrelated streams (its per-block program_id seeding is
    local by construction)."""
    if rate <= 0.0:
        return x
    if use_hardware is None:
        use_hardware = jax.default_backend() == "tpu"
    if use_hardware:
        if row_offset is not None:
            rng = jax.random.fold_in(rng, row_offset)
        seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        return hardware_dropout(x, seed, float(rate))
    keep = 1.0 - rate
    if row_offset is None:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    else:
        rows = row_offset + jnp.arange(x.shape[0])
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(rows)
        mask = jax.vmap(
            lambda k: jax.random.bernoulli(k, keep, x.shape[1:]))(keys)
    scale = jnp.asarray(1.0 / keep, x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros((), x.dtype))
