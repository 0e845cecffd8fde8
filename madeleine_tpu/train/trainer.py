"""Training loop — one jitted train step, mesh data parallelism.

Re-implements the reference trainer (ref: madeleine/utils/trainer.py:20-145)
as a single donated-state jitted step:

- per-stain masked losses replace the reference's boolean-subset indexing
  (trainer.py:25-33): masked InfoNCE/GOT over the full static batch is
  mathematically identical to subsetting (see ops/losses.py) and jit-friendly;
- the "skip batch with only HE" python `continue` (trainer.py:120-122) becomes
  a lax.cond-gated optimizer update — the step is a no-op (state unchanged)
  when no stain has >=2 valid cases, matching reference semantics without
  retracing;
- batch-dim sharding over a `jax.sharding.Mesh` (the DataParallel
  replacement, SURVEY §2b / ref setup_components.py:185-187): the WHOLE
  loss+grad runs inside `shard_map` over the "data" axis — each device runs
  the Pallas train kernels (fused encoder, IPOT/GW/glue) on its LOCAL batch
  shard. This is load-bearing, not style: a `pallas_call` is opaque to
  GSPMD, so under plain jit the SPMD partitioner ALL-GATHERS its sharded
  operands and every device computes the full global batch (round-4
  verdict). Inside shard_map the losses use explicit collectives — embedding
  all-gather for global-batch InfoNCE negatives (matching the reference,
  where DataParallel gathers outputs to one GPU before the loss), pmin/pmax
  for the GOT threshold statistics, psum for per-stain sums/counts and for
  the weight gradients — so the step's numbers equal the single-device
  global-batch computation exactly (dropout included: kernel seeds and
  software dropout keys index GLOBAL rows, see ops/encoder_train._block_seed
  and ops/dropout.dropout);
- the epoch smooth-rank on HE embeddings (trainer.py:141-143) is computed from
  per-step HE embeddings the step already produces.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from madeleine_tpu.config import HE_POSITION, MadeleineConfig, compute_dtype
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.ops import losses as L
from madeleine_tpu.ops.rank import smooth_rank_measure

WHOLE_VIEW_POSITION = 0  # ref: trainer.py:16


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Loss assembly (ref: trainer.py:20-77)
# ---------------------------------------------------------------------------

def compute_losses(
    cfg: MadeleineConfig,
    slide_embs: jnp.ndarray,      # [bs, n_mod, n_views, e]
    token_embs: jnp.ndarray,      # [bs, n_mod, t, 128]
    modality_labels: jnp.ndarray, # [bs, n_mod] float/bool
    sample_mask: Optional[jnp.ndarray],  # [bs] bool (batch padding)
    rng,
    token_mask: Optional[jnp.ndarray] = None,  # [bs, n_mod, t] ragged bags
    axis_name: Optional[str] = None,  # shard_map data axis (DP lane)
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (total_loss, any_stain_flag, metrics).

    With `axis_name` (inside the shard_map DP lane) the inputs are LOCAL
    batch shards; every returned value is the GLOBAL-batch quantity,
    identical (up to f32 reduction order) to the unsharded computation:
    InfoNCE all-gathers embeddings, GOT pmin/pmaxes its threshold statistics
    and psums its per-stain sums, counts are psum'ed."""
    n_mod = slide_embs.shape[1]
    use_global = cfg.global_loss == "info-nce"
    use_local = cfg.local_loss == "got"
    use_intra = cfg.intra_modality_loss == "info-nce"

    he_whole = slide_embs[:, HE_POSITION, WHOLE_VIEW_POSITION]
    total = jnp.zeros((), jnp.float32)
    any_flag = jnp.zeros((), bool)
    metrics: Dict[str, jnp.ndarray] = {}

    stain_labels, stain_counts = [], []
    for stain_idx in range(1, n_mod):
        labels = modality_labels[:, stain_idx] > 0
        if sample_mask is not None:
            labels = labels & sample_mask
        stain_labels.append(labels)
        cnt = jnp.sum(labels)
        if axis_name is not None:
            cnt = jax.lax.psum(cnt, axis_name)     # global valid-case count
        stain_counts.append(cnt)
    stain_flags = [c > 1 for c in stain_counts]    # ref trainer.py:26 (>=2 for CL)

    # global row index of this shard's sample 0 — keeps the per-sample RNG
    # draws below invariant to batch sharding
    if axis_name is not None:
        row_off = (jax.lax.axis_index(axis_name)
                   * slide_embs.shape[0]).astype(jnp.int32)
    else:
        row_off = jnp.zeros((), jnp.int32)

    def _info_nce(q, k, mask):
        if axis_name is None:
            return L.info_nce(q, k, temperature=cfg.temperature,
                              symmetric=cfg.symmetric_cl, mask=mask)
        return L.info_nce_global(q, k, axis_name=axis_name,
                                 temperature=cfg.temperature,
                                 symmetric=cfg.symmetric_cl, mask=mask)

    # ---- local GOT: one batched transport over all stain pairs -----------
    got_per_stain = None
    if use_local:
        t = token_embs.shape[2]
        sub = min(cfg.got_subsample, t)
        got_rngs = jax.random.split(rng, n_mod)

        def subsample_side(tokens, mask, key):
            """tokens [bs, t, d] -> [bs, sub, d]; masked per-sample
            without-replacement draw (Gumbel top-k, ops/losses.py) when a
            token mask is given, else a shared random permutation."""
            if mask is not None:
                return L.masked_subsample(tokens, mask, key, sub,
                                          row_offset=row_off)
            idx = jax.random.permutation(key, t)[:sub]
            return jnp.take(tokens, idx, axis=1)

        vs, qs = [], []
        for s, stain_idx in enumerate(range(1, n_mod)):
            k_v, k_q = jax.random.split(got_rngs[stain_idx])
            tm_he = None if token_mask is None else token_mask[:, HE_POSITION]
            tm_st = None if token_mask is None else token_mask[:, stain_idx]
            if token_mask is None:
                # reference-style shared index set per stain pair
                vs.append(subsample_side(token_embs[:, HE_POSITION], None, k_v))
                qs.append(subsample_side(token_embs[:, stain_idx], None, k_v))
            else:
                vs.append(subsample_side(token_embs[:, HE_POSITION], tm_he, k_v))
                qs.append(subsample_side(token_embs[:, stain_idx], tm_st, k_q))
        got_per_stain = L.got_loss_multi(
            jnp.stack(vs), jnp.stack(qs),
            sample_mask=jnp.stack(stain_labels),
            axis_name=axis_name)                            # [n_mod-1]

    if use_intra:
        mode = cfg.intra_modality_mode_wsi
        if axis_name is not None and mode not in (
                "reconstruct_avg_emb", "reconstruct_masked_emb"):
            intra = functools.partial(L.info_nce_global, axis_name=axis_name,
                                      temperature=cfg.temperature)
        elif axis_name is not None:
            _mse = L.make_intra_loss(mode, cfg.temperature)
            intra = (lambda q, k, mask=None, symmetric=False:
                     jax.lax.pmean(_mse(q, k), axis_name))  # global batch mean
        else:
            intra = L.make_intra_loss(mode, cfg.temperature)

    for s, stain_idx in enumerate(range(1, n_mod)):
        labels, flag = stain_labels[s], stain_flags[s]
        stain_total = jnp.zeros((), jnp.float32)

        if use_global:
            stain_total += _info_nce(
                he_whole, slide_embs[:, stain_idx, WHOLE_VIEW_POSITION],
                labels)
        if use_local:
            stain_total += cfg.local_loss_weight * got_per_stain[s]
        if use_intra:
            # two half-bag views of HE and of the stain (ref: trainer.py:51-66)
            l_he = intra(slide_embs[:, HE_POSITION, 1],
                         slide_embs[:, HE_POSITION, 2],
                         mask=labels, symmetric=cfg.symmetric_cl)
            l_st = intra(slide_embs[:, stain_idx, 1],
                         slide_embs[:, stain_idx, 2],
                         mask=labels, symmetric=cfg.symmetric_cl)
            stain_total += l_he + l_st

        total += jnp.where(flag, stain_total, 0.0)
        any_flag = any_flag | flag
        metrics[f"n_{cfg.MODALITIES[stain_idx]}"] = stain_counts[s]

    return total, any_flag, metrics


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def make_train_step(cfg: MadeleineConfig, tx: optax.GradientTransformation,
                    mesh=None, donate: bool = True):
    """Build the jitted train step.

    With a mesh, batch inputs are sharded on the leading axis and params are
    replicated. The loss+grad computation runs inside `shard_map` over the
    "data" axis — each device feeds its LOCAL batch shard to the Pallas train
    kernels (which GSPMD cannot partition; see module docstring) and the
    losses gather/reduce explicitly, so loss, gradients, and dropout draws
    equal the single-device global-batch run exactly. The optimizer update
    then applies replicated (psum'ed) grads outside the shard_map region.
    """
    n_views = 3 if cfg.intra_modality_loss == "info-nce" else 1
    dtype = compute_dtype(cfg.precision)

    def loss_fn(params, batch, rng, axis_name=None):
        drop_rng, loss_rng = jax.random.split(rng)
        feats = batch["feats"].astype(dtype)
        # mixed precision: compute in `dtype` with f32 master params (the
        # autocast analog, ref trainer.py:108) — without this cast every
        # bf16-x-f32 op promotes to f32, doubling activation memory
        cparams = (params if dtype == jnp.float32
                   else jax.tree.map(lambda p: p.astype(dtype), params))
        token_mask = batch.get("token_mask")   # [bs, n_mod, t] ragged bags
        slide_embs, token_embs = mtm.forward_train(
            cparams, cfg, feats, mask=token_mask, n_views=n_views,
            rng=drop_rng, train=True, use_pallas=None, axis_name=axis_name)
        total, any_flag, metrics = compute_losses(
            cfg, slide_embs.astype(jnp.float32), token_embs,
            batch["modality_labels"], batch.get("sample_mask"), loss_rng,
            token_mask=token_mask, axis_name=axis_name)
        # failure detection: a non-finite loss skips the update instead of
        # poisoning the optimizer state (no reference equivalent, SURVEY §5)
        any_flag = any_flag & jnp.isfinite(total)
        he_embs = slide_embs[:, HE_POSITION, WHOLE_VIEW_POSITION].astype(jnp.float32)
        return total, (any_flag, he_embs, metrics)

    def apply_update(state: TrainState, grads, any_flag):
        def do_update(_):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(new_params, new_opt, state.step + 1)

        def skip_update(_):
            # batch had no usable stain pair: no-op, including the scheduler
            # step count (ref python `continue`, trainer.py:120-122)
            return state

        return jax.lax.cond(any_flag, do_update, skip_update, None)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        from madeleine_tpu.parallel.mesh import DATA_AXIS

        def local_grads(params, batch, rng):
            """Runs per-shard inside shard_map: local forward (Pallas kernels
            on the local rows), global-batch loss via in-function collectives,
            local backward; the param-grad contributions psum to the exact
            global gradient (the all-gathers' transposes scatter the other
            shards' cotangents back to their owners)."""
            (loss, (any_flag, he_embs, metrics)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, rng, DATA_AXIS)
            grads = jax.lax.psum(grads, DATA_AXIS)
            return loss, any_flag, he_embs, metrics, grads

        grads_fn = shard_map(
            local_grads, mesh=mesh,
            # prefix pytrees: P()/P(DATA_AXIS) broadcast over whole subtrees
            in_specs=(P(), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P(DATA_AXIS), P(), P()),
            # the Pallas kernels' out_shapes carry no vma annotations, so the
            # replication checker cannot track them. Safe here: autodiff
            # happens INSIDE this region (no transpose through the shard_map
            # boundary), and every P() output is explicitly psum/pmean'ed
            # replicated — verified end-to-end by the 8-vs-1 equality tests
            # (tests/test_fused_sharded.py, tests/test_parallel.py).
            check_vma=False,
        )

        def mesh_step_fn(state: TrainState, batch, rng):
            loss, any_flag, he_embs, metrics, grads = grads_fn(
                state.params, batch, rng)
            new_state = apply_update(state, grads, any_flag)
            metrics = dict(metrics, loss=loss, skipped=~any_flag)
            return new_state, he_embs, metrics

        repl = NamedSharding(mesh, P())        # params/opt state: replicated
        data = NamedSharding(mesh, P(DATA_AXIS))  # batch: leading-dim sharded
        return jax.jit(
            mesh_step_fn,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, data, repl),
            donate_argnums=(0,) if donate else (),
        )

    def step_fn(state: TrainState, batch, rng):
        (loss, (any_flag, he_embs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        new_state = apply_update(state, grads, any_flag)
        metrics = dict(metrics, loss=loss, skipped=~any_flag)
        return new_state, he_embs, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# Epoch loop (ref: trainer.py:80-145)
# ---------------------------------------------------------------------------

def _local_shard_rows(arr) -> np.ndarray:
    """This host's contiguous row block of a batch-sharded global array."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

def train_loop(
    cfg: MadeleineConfig,
    train_step,
    state: TrainState,
    dataloader,
    epoch: int,
    rng_key,
    mesh=None,
    log_every: int = 0,
) -> Tuple[TrainState, float, float, Dict[str, float]]:
    """One epoch. Returns (state, epoch_loss, train_rank, agg_metrics).

    Multi-host: when jax.process_count() > 1 (and a mesh is given), each
    host's loader yields its LOCAL row block; the blocks are assembled into
    global batch-sharded arrays and the identical jitted step runs SPMD
    across hosts. Epoch HE embeddings are all-gathered at the end so the
    smooth-rank metric (and hence checkpoint gating) is global and identical
    on every host."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from madeleine_tpu.parallel import multihost as mh

    multihost = mesh is not None and jax.process_count() > 1

    # Device results are collected WITHOUT per-step host syncs — float()-ing
    # the loss every step would serialize host and device; instead async
    # dispatch pipelines the epoch and we fetch once at the end. Dispatch is
    # WINDOWED, not unbounded: every step enqueues a host->device transfer
    # whose source buffer stays pinned until the device consumes it, so on a
    # slow link (the axon tunnel moves ~35 MB/s) an unbounded epoch pins
    # up to batches_per_epoch x batch_bytes of host RAM (measured ~94 GB at
    # ACROBAT scale). Blocking on the loss from K steps ago keeps K batches
    # in flight — deep enough to hide any realistic transfer/step ratio.
    window = int(os.environ.get("MADELEINE_DISPATCH_WINDOW", "8"))
    losses, skips, embeds_dev, masks = [], [], [], []
    t0 = time.time()

    # convert on host before the transfer: a canonical batch is 1.36 GB f32,
    # and host->device bandwidth (PCIe or, worse, a tunnel) is the scarce
    # resource — bf16 halves it
    host_dtype = None
    if compute_dtype(cfg.precision) == jnp.bfloat16:
        try:
            import ml_dtypes

            host_dtype = ml_dtypes.bfloat16
        except ImportError:
            pass

    for b_idx, batch in enumerate(dataloader):
        step_rng = jax.random.fold_in(jax.random.fold_in(rng_key, epoch), b_idx)
        feats_host = batch["feats"]
        if host_dtype is not None and feats_host.dtype != host_dtype:
            feats_host = feats_host.astype(host_dtype)
        host_batch = {
            "feats": feats_host,
            "modality_labels": batch["modality_labels"],
            "sample_mask": batch.get(
                "sample_mask", np.ones(batch["feats"].shape[0], bool)),
        }
        # ragged full-bag mode: the loader's validity mask MUST travel with
        # the batch, else zero-padding gets softmax attention / GOT samples
        if "token_mask" in batch:
            host_batch["token_mask"] = batch["token_mask"]
        if multihost:
            # local row blocks -> one global batch-sharded array per leaf
            device_batch = mh.global_batch(mesh, host_batch)
        elif mesh is not None:
            data = NamedSharding(mesh, P("data"))
            device_batch = {k: jax.device_put(jnp.asarray(v), data)
                            for k, v in host_batch.items()}
        else:
            device_batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
        state, he_embs, metrics = train_step(state, device_batch, step_rng)
        losses.append(metrics["loss"])
        skips.append(metrics["skipped"])
        embeds_dev.append(he_embs)
        if window > 0 and len(losses) > window:
            # bounded dispatch: materialize ALL outputs of the step K back
            # (host fetches, not block_until_ready — the axon tunnel does
            # not force enqueued chained work on it, CLAUDE.md). Fetching
            # every output releases that step's execution record, and with
            # it the pinned input batch: clients that hold execution
            # arguments until the outputs are consumed (the tunnel) would
            # otherwise pin batches_per_epoch x batch_bytes of host RAM
            # (measured: ~1.3 GB/step growth at ACROBAT scale, OOM before
            # one epoch). On real hosts the K-back step is long done and
            # these fetches cost ~us.
            k = len(losses) - window - 1
            losses[k] = float(losses[k])
            skips[k] = bool(skips[k])
            if not multihost:
                # multihost embeddings are batch-sharded global arrays —
                # fetched via their local shards at epoch end instead
                embeds_dev[k] = np.asarray(embeds_dev[k])
        masks.append(np.asarray(batch.get(
            "sample_mask", np.ones(batch["feats"].shape[0], bool))))
        if log_every and (b_idx % log_every) == 0:
            print(f"Loss for batch: {b_idx} = {float(metrics['loss']):.3f}")

    if multihost:
        # loss/skip are replicated (readable on every host); HE embeddings
        # are batch-sharded globals — fetch this host's rows, then one
        # all-gather reassembles the epoch set identically on all hosts
        # (smooth rank is row-permutation invariant)
        losses, skips = jax.device_get((losses, skips))
        embeds_host = [_local_shard_rows(e) for e in embeds_dev]
    else:
        losses, skips, embeds_host = jax.device_get((losses, skips, embeds_dev))
    skips = np.asarray(skips, bool)
    losses = np.asarray(losses, np.float64)
    ep_loss = float(losses[~skips].sum()) if len(losses) else 0.0
    if multihost and embeds_host:
        local = np.concatenate(embeds_host, axis=0)
        local_mask = np.concatenate(masks, axis=0)
        embeds = mh.allgather_rows(local)[mh.allgather_rows(local_mask)]
    else:
        all_embeds = [e[m] for e, m in zip(embeds_host, masks)]
        embeds = (np.concatenate(all_embeds, axis=0) if all_embeds
                  else np.zeros((2, 2)))
    rank = float(smooth_rank_measure(jnp.asarray(embeds)))
    agg = {
        "epoch_time": time.time() - t0,
        "n_steps": int((~skips).sum()),
        "n_skipped": int(skips.sum()),
    }
    return state, ep_loss, rank, agg
