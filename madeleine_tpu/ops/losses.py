"""Contrastive + optimal-transport losses — pure jittable JAX.

Re-implements the reference objective stack (ref: madeleine/utils/loss.py):

- `info_nce`: temperature-scaled contrastive CE with implicit in-batch
  negatives and the optional symmetric variant (ref: loss.py:65-127). Extended
  with (a) a validity mask so variable per-stain subsets run under jit with
  static shapes (the reference boolean-indexes the batch, trainer.py:25-33),
  and (b) a cross-device flavor that all-gathers embeddings over the mesh so
  the negative set is the *global* batch (ref semantics: DataParallel gathers
  outputs to one GPU before the loss, setup_components.py:186 + trainer.py:111).
- `got_loss`: Graph Optimal Transport = IPOT Wasserstein + Gromov-Wasserstein
  (ref: loss.py:160-301, itself from VoLTA). Sinkhorn/IPOT inner loops are
  `lax.fori_loop`s; traces are computed as Frobenius inner products
  <C, T> instead of materializing C^T T (same math, no [m, m] intermediate).

Numerics: everything here runs in fp32 regardless of the model compute dtype —
temperature 0.001 scales cosine logits by 1000x, and exp(-C/beta) with
beta=0.5/0.1 underflows fast in bf16 (SURVEY §2b mixed-precision note). All
contractions use Precision.HIGHEST: TPU's default matmul truncates f32 operands
to bf16, which alone injects ~4.0 of absolute logit noise at temperature 0.001.

Documented deviations from reference bugs:
- GOT token subsampling: the reference draws `randperm(batch_size)[:256]` and
  indexes it into the *token* dim (ref: loss.py:281-284), i.e. it samples
  min(bs, 256) tokens from the first bs token positions. We sample `subsample`
  token indices uniformly from the full token range (shared between the two
  bags, as intended).
- InfoNCE explicit-negatives modes fall through without returning a loss in the
  reference (ref: loss.py:93-110); here they return the standard CE over
  [positive | negatives] logits.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

_EPS_NORM = 1e-12
_NEG_INF = -1e30  # finite mask fill — keeps gradients NaN-free under jnp.where


def _l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps)
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, _EPS_NORM)


# ---------------------------------------------------------------------------
# InfoNCE
# ---------------------------------------------------------------------------

def _masked_ce_diag(logits: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean CE with diagonal labels; invalid rows dropped, invalid columns
    excluded from the denominator. Equivalent to subsetting valid entries."""
    if mask is not None:
        logits = jnp.where(mask[None, :], logits, _NEG_INF)
    lse = jax.nn.logsumexp(logits, axis=1)
    diag = jnp.diagonal(logits)
    ce = lse - diag
    if mask is None:
        return jnp.mean(ce)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, ce, 0.0)) / denom


def info_nce(
    query: jnp.ndarray,                  # [n, d]
    positive_key: jnp.ndarray,           # [n, d]
    negative_keys: Optional[jnp.ndarray] = None,
    *,
    temperature: float = 0.1,
    symmetric: bool = False,
    mask: Optional[jnp.ndarray] = None,  # [n] bool — valid rows/cols
    negative_mode: str = "unpaired",
) -> jnp.ndarray:
    """InfoNCE loss (ref: loss.py:65-127). fp32 throughout."""
    q = _l2_normalize(query.astype(jnp.float32))
    k = _l2_normalize(positive_key.astype(jnp.float32))

    if negative_keys is not None:
        nk = _l2_normalize(negative_keys.astype(jnp.float32))
        pos = jnp.sum(q * k, axis=1, keepdims=True)
        if negative_mode == "unpaired":
            neg = jnp.matmul(q, nk.T, precision=_HI)   # [n, M]
        elif negative_mode == "paired":
            neg = jnp.einsum("nd,nmd->nm", q, nk, precision=_HI)
        else:
            raise ValueError(f"bad negative_mode {negative_mode}")
        logits = jnp.concatenate([pos, neg], axis=1) / temperature
        ce = jax.nn.logsumexp(logits, axis=1) - logits[:, 0]
        if mask is None:
            return jnp.mean(ce)
        return jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(jnp.sum(mask), 1)

    logits = jnp.matmul(q, k.T, precision=_HI) / temperature
    loss = _masked_ce_diag(logits, mask)
    if symmetric:
        loss = 0.5 * loss + 0.5 * _masked_ce_diag(logits.T, mask)
    return loss


def info_nce_global(
    query: jnp.ndarray,
    positive_key: jnp.ndarray,
    *,
    axis_name: str,
    temperature: float = 0.1,
    symmetric: bool = False,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross-device InfoNCE: all-gather embeddings along `axis_name` so the
    in-batch negatives span the global batch (callable inside shard_map/pjit
    with a named mesh axis). The all-gather's transpose is a reduce-scatter, so
    gradients w.r.t. the local shard are exact."""
    q = jax.lax.all_gather(query, axis_name, tiled=True)
    k = jax.lax.all_gather(positive_key, axis_name, tiled=True)
    m = None if mask is None else jax.lax.all_gather(mask, axis_name, tiled=True)
    loss = info_nce(q, k, temperature=temperature, symmetric=symmetric, mask=m)
    # value is identical on every device; pmean makes that replication provable
    # to shard_map's out_specs checker (and is a no-op numerically)
    return jax.lax.pmean(loss, axis_name)


# ---------------------------------------------------------------------------
# Graph Optimal Transport
# ---------------------------------------------------------------------------

def cosine_cost(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """1 - cosine similarity between token sets.
    x: [b, n, d], y: [b, m, d] -> [b, n, m] (ref: loss.py:162-176; the
    reference normalizes over the feature dim with +1e-12)."""
    xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + _EPS_NORM)
    yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + _EPS_NORM)
    return 1.0 - jnp.einsum("bnd,bmd->bnm", xn, yn, precision=_HI)


def _threshold_relu(C: jnp.ndarray, sample_mask: Optional[jnp.ndarray],
                    beta: float = 0.1) -> jnp.ndarray:
    """Sparsify: relu(C - (min + beta*(max-min))) with min/max over the whole
    (valid part of the) batch tensor (ref: loss.py:225-233, 288-292)."""
    if sample_mask is not None:
        valid = sample_mask[:, None, None]
        big, small = jnp.float32(jnp.inf), jnp.float32(-jnp.inf)
        cmin = jnp.min(jnp.where(valid, C, big))
        cmax = jnp.max(jnp.where(valid, C, small))
    else:
        cmin, cmax = jnp.min(C), jnp.max(C)
    thr = cmin + beta * (cmax - cmin)
    return jax.nn.relu(C - thr)


def ipot_plan(C: jnp.ndarray, beta: float = 0.5, iterations: int = 50) -> jnp.ndarray:
    """IPOT proximal-point transport plan (ref: loss.py:179-193).
    C: [b, n, m] -> T: [b, n, m]. Uniform marginals."""
    b, n, m = C.shape
    A = jnp.exp(-C / beta)

    def body(_, carry):
        T, sigma = carry
        Q = A * T                                     # [b, n, m]
        delta = 1.0 / (n * jnp.einsum("bnm,bmo->bno", Q, sigma, precision=_HI))
        a = jnp.einsum("bnm,bno->bmo", Q, delta, precision=_HI)    # [b, m, 1]
        sigma = 1.0 / (m * a)
        T = delta * Q * jnp.swapaxes(sigma, 1, 2)
        return T, sigma

    T0 = jnp.ones((b, n, m), jnp.float32)
    sigma0 = jnp.ones((b, m, 1), jnp.float32) / m
    T, _ = jax.lax.fori_loop(0, iterations, body, (T0, sigma0))
    return T


def _plan(C: jnp.ndarray, beta: float, iterations: int) -> jnp.ndarray:
    """ipot_plan, routed through the fused on-chip kernel (ops/ipot.py) on
    TPU when the per-problem state fits VMEM. Same math either way."""
    n, m = C.shape[-2], C.shape[-1]
    fits = n * m <= 256 * 1024 and iterations * (n * m + m) * 4 <= 40 * 2**20
    if fits and jax.default_backend() == "tpu":
        from madeleine_tpu.ops.ipot import ipot_plan_fused

        return ipot_plan_fused(C, beta, iterations)
    return ipot_plan(C, beta=beta, iterations=iterations)


def _gw_gamma(CsL, CtL, CstL, gamma0, beta: float, outer: int,
              ot_iters: int) -> jnp.ndarray:
    """The detached GW gamma loop (ref: loss.py:243-248). On TPU with
    VMEM-sized problems the WHOLE loop (outer einsum chain + inner IPOT) runs
    as one pallas_call per problem (ops/ipot.py::gw_gamma_fused — forward
    only, gamma is detached by every caller); elsewhere it is the XLA
    fori_loop over `_plan`. Inputs must already be stop_gradient'ed."""
    n, m = CstL.shape[-2], CstL.shape[-1]
    fits = n * n + m * m + 6 * n * m <= 2 * 1024 * 1024
    if fits and jax.default_backend() == "tpu":
        from madeleine_tpu.ops.ipot import gw_gamma_fused

        return gw_gamma_fused(CsL, CtL, CstL, beta, outer, ot_iters)

    def body(_, gamma):
        C_gamma = CstL - 2.0 * jnp.einsum("bnk,bkl,bml->bnm", CsL, gamma, CtL,
                                          precision=_HI)
        return _plan(C_gamma, beta, ot_iters)

    return jax.lax.fori_loop(0, outer, body, gamma0)


def ipot_distance(C: jnp.ndarray, iterations: int = 50) -> jnp.ndarray:
    """Per-sample Wasserstein cost <C, T> (ref: loss.py:202-207 returns the
    negative; callers negate again — we return the positive cost directly)."""
    T = _plan(C, 0.5, iterations)
    return jnp.sum(C * T, axis=(1, 2))               # trace(C^T T) == <C, T>_F


def gw_distance(
    x: jnp.ndarray, y: jnp.ndarray,
    *,
    sample_mask: Optional[jnp.ndarray] = None,
    lamda: float = 0.1,
    iterations: int = 5,
    ot_iterations: int = 20,
) -> jnp.ndarray:
    """Gromov-Wasserstein distance between token graphs, uniform marginals
    (ref: loss.py:236-275). x: [b, n, d], y: [b, m, d] -> [b]."""
    Cs = _threshold_relu(cosine_cost(x, x), sample_mask)  # [b, n, n]
    Ct = _threshold_relu(cosine_cost(y, y), sample_mask)  # [b, m, m]
    b, n, _ = Cs.shape
    m = Ct.shape[1]
    p = jnp.full((b, n, 1), 1.0 / n, jnp.float32)
    q = jnp.full((b, m, 1), 1.0 / m, jnp.float32)

    # Cst = (Cs^2 p) 1_m^T + 1_n (q^T (Ct^2)^T)   (ref: loss.py:240-241)
    cs2p = jnp.einsum("bnk,bko->bno", Cs ** 2, p, precision=_HI)
    qtct2 = jnp.einsum("bko,bmk->bom", q, Ct ** 2, precision=_HI)
    Cst = cs2p + qtct2                                    # broadcast outer sum

    gamma0 = jnp.einsum("bno,bmo->bnm", p, q, precision=_HI)  # outer product

    # gamma is detached below (ref: loss.py:248 .detach()), so feed the loop
    # stop_gradient'ed inputs too: otherwise jax still LINEARIZES the 5x20
    # iterations (residual-saving forward) even though every tangent is dead —
    # measured 2.8x of the whole GW grad. Identical value and gradient.
    CsL, CtL, CstL = map(jax.lax.stop_gradient, (Cs, Ct, Cst))
    gamma = _gw_gamma(CsL, CtL, CstL, gamma0, lamda, iterations,
                      ot_iterations)
    gamma = jax.lax.stop_gradient(gamma)
    C_final = Cst - 2.0 * jnp.einsum("bnk,bkl,bml->bnm", Cs, gamma, Ct,
                                     precision=_HI)
    return jnp.sum(C_final * gamma, axis=(1, 2))          # trace(Cgamma^T gamma)


def masked_subsample(x: jnp.ndarray, mask: jnp.ndarray, key,
                     subsample: int, row_offset=None) -> jnp.ndarray:
    """Uniform WITHOUT-replacement draw of `subsample` tokens per sample from
    its valid positions, via masked Gumbel top-k.

    x: [b, n, d]; mask: [b, n] bool. A bag with >= subsample valid tokens
    yields a uniform random subset (no duplicates); a shorter bag tiles a
    random permutation of its valid tokens cyclically, so duplicates appear
    only when unavoidable (matching the reference loader's pad-with-
    replacement spirit, wsi_dataset.py:42-50, without the round-2 categorical
    draw's duplicate tokens in short-but-sufficient bags). The reference's own
    subsample (loss.py:281-284) indexes randperm(batch) into the token dim —
    a documented bug we deliberately do not reproduce.

    row_offset: optional i32 scalar — global index of x's first row. When
    given, each sample's Gumbel noise comes from fold_in(key, global_row), so
    the draw is invariant to batch sharding (shard_map DP lane)."""
    if row_offset is not None:
        rows = row_offset + jnp.arange(mask.shape[0])
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(rows)
        g = jax.vmap(
            lambda k: jax.random.gumbel(k, mask.shape[1:]))(keys)  # [b, n]
    else:
        g = jax.random.gumbel(key, mask.shape)             # [b, n]
    scores = jnp.where(mask, g, _NEG_INF)
    _, idx = jax.lax.top_k(scores, subsample)              # [b, sub] valid-first
    n_valid = jnp.sum(mask, axis=-1, keepdims=True)        # [b, 1]
    pos = jnp.arange(subsample)[None, :]
    idx = jnp.take_along_axis(idx, pos % jnp.maximum(n_valid, 1), axis=1)
    return jnp.take_along_axis(x, idx[..., None], axis=1)


def got_loss(
    v: jnp.ndarray,                       # [b, n, d] e.g. HE token embeddings
    q: jnp.ndarray,                       # [b, n, d] IHC token embeddings
    *,
    sample_mask: Optional[jnp.ndarray] = None,   # [b] valid samples
    token_mask: Optional[jnp.ndarray] = None,    # [b, n] (or a (mask_v,
                                                 # mask_q) pair) valid tokens
    subsample: Optional[int] = None,
    rng=None,
    ot_iterations: int = 30,              # ref call site: loss.py:294 (30)
    gw_iterations: int = 5,
    gw_ot_iterations: int = 20,
) -> jnp.ndarray:
    """Total GOT loss = sum_b WD + sum_b GWD over valid samples
    (ref: loss.py:278-301: twd = mean(sum(gwd)) + mean(sum(wd)) == sum+sum).

    With `token_mask` (padded ragged bags — no reference equivalent, which
    always trains on fixed-length subsampled bags), the subsample draws each
    side's per-sample indices from its OWN valid positions without
    replacement (masked Gumbel top-k; GOT transports between token sets, so
    the sides need not share indices). Requires `subsample`."""
    v = v.astype(jnp.float32)
    q = q.astype(jnp.float32)

    if token_mask is not None:
        if subsample is None or rng is None:
            raise ValueError("token_mask requires subsample + rng")
        mask_v, mask_q = (token_mask if isinstance(token_mask, (tuple, list))
                          else (token_mask, token_mask))
        rng_v, rng_q = jax.random.split(rng)
        v = masked_subsample(v, mask_v, rng_v, subsample)
        q = masked_subsample(q, mask_q, rng_q, subsample)
    elif subsample is not None and subsample < v.shape[1]:
        if rng is None:
            raise ValueError("got_loss subsampling requires rng")
        idx = jax.random.permutation(rng, v.shape[1])[:subsample]
        v = jnp.take(v, idx, axis=1)
        q = jnp.take(q, idx, axis=1)

    C = _threshold_relu(cosine_cost(v, q), sample_mask)
    wd = ipot_distance(C, iterations=ot_iterations)       # [b]
    gwd = gw_distance(v, q, sample_mask=sample_mask,
                      lamda=0.1, iterations=gw_iterations,
                      ot_iterations=gw_ot_iterations)     # [b]
    if sample_mask is not None:
        wd = jnp.where(sample_mask, wd, 0.0)
        gwd = jnp.where(sample_mask, gwd, 0.0)
    return jnp.sum(wd) + jnp.sum(gwd)


def got_loss_multi(
    v: jnp.ndarray,                       # [S, b, n, d] HE tokens per stain pair
    q: jnp.ndarray,                       # [S, b, n, d] IHC tokens
    *,
    sample_mask: Optional[jnp.ndarray] = None,   # [S, b]
    ot_iterations: int = 30,
    gw_iterations: int = 5,
    gw_ot_iterations: int = 20,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """All stain pairs' GOT in ONE batched transport problem -> per-stain
    losses [S].

    Semantics identical to S separate `got_loss` calls (the threshold-relu
    min/max is still computed PER STAIN PAIR, matching the reference's
    per-call batch statistics, loss.py:288-292) — but the ~130 sequential
    Sinkhorn iterations run once over a [S*b, n, m] batch instead of S times
    over [b, n, m], cutting kernel-launch serialization by S x. Inputs are
    pre-subsampled (see compute_losses).

    axis_name: shard_map data-parallel lane — b is then the LOCAL shard's
    batch rows; the threshold min/max statistics are pmin/pmax'ed across
    shards and the per-stain sums psum'ed, so the result equals the
    single-device global-batch computation while the transport kernels run
    on local shards only (the pallas_calls are opaque to GSPMD, which would
    otherwise all-gather their operands — round-4 verdict)."""
    S, b, n, d = v.shape
    v32 = v.astype(jnp.float32).reshape(S * b, n, d)
    q32 = q.astype(jnp.float32).reshape(S * b, n, d)
    mask_flat = (None if sample_mask is None
                 else sample_mask.reshape(S * b))

    def group_threshold(C):
        """thr_s = min + 0.1 (max - min) with min/max per stain group
        s = batch // b, broadcast back to [S*b]."""
        Cg = C.reshape(S, b, *C.shape[1:])
        if sample_mask is not None:
            valid = sample_mask[..., None, None]
            cmin = jnp.min(jnp.where(valid, Cg, jnp.inf), axis=(1, 2, 3))
            cmax = jnp.max(jnp.where(valid, Cg, -jnp.inf), axis=(1, 2, 3))
        else:
            cmin = jnp.min(Cg, axis=(1, 2, 3))
            cmax = jnp.max(Cg, axis=(1, 2, 3))
        if axis_name is not None:
            # global-batch statistics (identical to the unsharded run).
            # all_gather + min instead of pmin: pmin has no differentiation
            # rule, and this form routes the threshold subgradient to the
            # argmin/argmax OWNER shard — the same element the unsharded
            # jnp.min/jnp.max would pick. [n_dev, S] gathers: trivial bytes.
            cmin = jnp.min(jax.lax.all_gather(cmin, axis_name), axis=0)
            cmax = jnp.max(jax.lax.all_gather(cmax, axis_name), axis=0)
        thr = cmin + 0.1 * (cmax - cmin)             # [S]
        return jnp.repeat(thr, b)                    # [S*b]

    m = n
    C0 = cosine_cost(v32, q32)
    Cs0 = cosine_cost(v32, v32)
    Ct0 = cosine_cost(q32, q32)
    thr3 = jnp.stack([group_threshold(X) for X in (C0, Cs0, Ct0)],
                     axis=1)                                 # [S*b, 3]
    # fused threshold-relu + Cst assembly (ops/got_glue.py) when the
    # per-problem tiles fit VMEM; plain XLA chain otherwise. Same math,
    # same gradients (the min/max threshold statistics stay out here, so
    # their subgradient routing is XLA's in both branches). Kill switch:
    # MADELEINE_NO_GOT_GLUE=1 (branch equality pinned in
    # tests/test_losses_parity.py::test_got_glue_branch_equality).
    fuse = (n * n + m * m + 6 * n * m <= 2 * 1024 * 1024
            and not os.environ.get("MADELEINE_NO_GOT_GLUE"))
    if fuse:
        from madeleine_tpu.ops.got_glue import gw_trace, threshold_build

        C, Cs, Ct, Cst = threshold_build(C0, Cs0, Ct0, thr3)
    else:
        C = jax.nn.relu(C0 - thr3[:, 0][:, None, None])
        Cs = jax.nn.relu(Cs0 - thr3[:, 1][:, None, None])
        Ct = jax.nn.relu(Ct0 - thr3[:, 2][:, None, None])
        p = jnp.full((S * b, n, 1), 1.0 / n, jnp.float32)
        qv = jnp.full((S * b, m, 1), 1.0 / m, jnp.float32)
        cs2p = jnp.einsum("bnk,bko->bno", Cs ** 2, p, precision=_HI)
        qtct2 = jnp.einsum("bko,bmk->bom", qv, Ct ** 2, precision=_HI)
        Cst = cs2p + qtct2
    wd = ipot_distance(C, iterations=ot_iterations)          # [S*b]

    gamma0 = jnp.full((S * b, n, m), 1.0 / (n * m), jnp.float32)
    # gamma is detached below — stop the loop inputs too so the 5x20
    # iterations are never linearized (see gw_distance)
    CsL, CtL, CstL = map(jax.lax.stop_gradient, (Cs, Ct, Cst))
    gamma = _gw_gamma(CsL, CtL, CstL, gamma0, 0.1, gw_iterations,
                      gw_ot_iterations)
    gamma = jax.lax.stop_gradient(gamma)
    if fuse:
        gwd = gw_trace(Cs, Ct, Cst, gamma)                   # [S*b]
    else:
        C_final = Cst - 2.0 * jnp.einsum("bnk,bkl,bml->bnm", Cs, gamma, Ct,
                                         precision=_HI)
        gwd = jnp.sum(C_final * gamma, axis=(1, 2))          # [S*b]

    total = wd + gwd
    if mask_flat is not None:
        total = jnp.where(mask_flat, total, 0.0)
    out = jnp.sum(total.reshape(S, b), axis=1)               # [S]
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)                   # global-batch sum
    return out


# ---------------------------------------------------------------------------
# Intra-modality loss selector (ref: loss.py:138-156)
# ---------------------------------------------------------------------------

def mse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def make_intra_loss(mode: str, temperature: float):
    """Returns loss_fn(query, positive_key, mask=None, symmetric=False)."""
    if mode in ("reconstruct_avg_emb", "reconstruct_masked_emb"):
        return lambda q, k, mask=None, symmetric=False: mse_loss(q, k)
    return functools.partial(info_nce, temperature=temperature)
