"""In-kernel hardware-RNG dropout masks — shared by the fused train kernels.

The TPU PRNG is the bottleneck of in-kernel dropout (NOTES.md: ~180 GB/s of
bits), so fewer bits per site = faster masks. 8-bit thresholds give 1/256
keep-probability granularity; to keep E[mask] exactly 1 the inverted-dropout
scale is computed from the INTEGER threshold actually used
(scale = 1 / (1 - thr/levels)), not the requested float rate — no mean shift
at any bit width.

Must be called inside a Pallas TPU kernel after `pltpu.prng_seed`. At
rate<=0 the PRNG is never touched (returns scalar 1.0), which keeps the
calling kernels lowerable in interpret mode on CPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def keep_mask(shape, rate: float):
    """Inverted-dropout keep/scale mask in f32 for a [rows, n] block.

    Narrowing bitcasts multiply the sublane dim (u32 -> 4x u8 or 2x u16), so
    the 8-bit path needs rows % 4 == 0, the 16-bit path rows % 2 == 0; the
    compare is widened to i32 (v5e has no native sub-32-bit vector compare).
    """
    if rate <= 0.0:
        return jnp.float32(1.0)
    rows, n = shape
    if rows % 4 == 0:
        levels = 1 << 8
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows // 4, n)),
                             jnp.uint8).astype(jnp.int32)
    elif rows % 2 == 0:
        levels = 1 << 16
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows // 2, n)),
                             jnp.uint16).astype(jnp.int32)
    else:
        levels = 1 << 31  # positive i32 range (top bit dropped by abs-mask)
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows, n)),
                             jnp.uint32).astype(jnp.int32) & jnp.int32(
                                 0x7FFFFFFF)
    thr = min(max(int(round(rate * levels)), 1), levels - 1)
    scale = jnp.float32(1.0 / (1.0 - thr / levels))
    return jnp.where(bits >= jnp.int32(thr), scale, jnp.float32(0.0))
