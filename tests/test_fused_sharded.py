"""The PRODUCTION train lane under the data mesh: fused Pallas kernels inside
shard_map must (a) compute exactly what the single-device run computes and
(b) actually partition — no bag-sized all-gathers in the compiled program.

Round-4 verdict: `pallas_call` is opaque to GSPMD, so under plain jit the
SPMD partitioner all-gathers sharded operands and replicates the compute.
The mesh train step therefore runs loss+grad inside shard_map
(train/trainer.py). These tests force the fused-kernel route on the CPU
backend (MADELEINE_FORCE_FUSED=1 -> interpret-mode Pallas, dropout rates 0
because the TPU hardware PRNG does not lower in interpret mode) so the
recorded suite exercises the exact route production uses on TPU.

Ref capability being replaced: nn.DataParallel scatter
(/root/reference/madeleine/utils/setup_components.py:185-187).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models.madeleine import init_madeleine_params
from madeleine_tpu.parallel.mesh import (
    assert_no_large_allgather,
    make_mesh,
    shard_batch,
)
from madeleine_tpu.train.optim import make_optimizer
from madeleine_tpu.train.trainer import init_train_state, make_train_step

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")

BS, N_MOD, T, D = 16, 3, 32, 16


def _cfg(intra=False):
    return MadeleineConfig(
        patch_embedding_dim=D, wsi_encoder_hidden_dim=16,
        attention_hidden_dim=16, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=["HE", "X", "Y"],
        temperature=0.01, lr=1e-3, max_epochs=2, warmup=True, warmup_epochs=1,
        batch_size=BS, got_subsample=8,
        global_loss="info-nce", local_loss="got", symmetric_cl=True,
        intra_modality_loss="info-nce" if intra else "-1",
    ).finalize()


def _batch(ragged: bool):
    rng = np.random.default_rng(3)
    labels = np.ones((BS, N_MOD), np.float32)
    labels[:, 2] = (rng.random(BS) < 0.7).astype(np.float32)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((BS, N_MOD, T, D)),
                             jnp.float32),
        "modality_labels": jnp.asarray(labels),
        "sample_mask": jnp.ones(BS, bool),
    }
    if ragged:
        lengths = rng.integers(T // 2, T + 1, size=(BS, N_MOD))
        batch["token_mask"] = jnp.asarray(
            np.arange(T)[None, None, :] < lengths[:, :, None])
    return batch


@needs_8
@pytest.mark.parametrize("intra", [False, True], ids=["nviews1", "nviews3"])
@pytest.mark.parametrize("ragged", [False, True], ids=["dense", "ragged"])
def test_fused_sharded_step_matches_single(monkeypatch, intra, ragged):
    """8-device shard_map step == single-device step, FUSED kernel route.
    Covers the GOT threshold pmin/pmax, the psum'ed per-stain sums, the
    masked-subsample global-row keys (ragged), and the half-bag views
    (nviews3) — the full production loss stack."""
    monkeypatch.setenv("MADELEINE_FORCE_FUSED", "1")
    cfg = _cfg(intra)
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=4)
    batch = _batch(ragged)

    s1 = init_train_state(params, tx)
    step1 = make_train_step(cfg, tx, donate=False)
    s1, he1, m1 = step1(s1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    s8 = init_train_state(params, tx)
    step8 = make_train_step(cfg, tx, mesh=mesh, donate=False)
    s8, he8, m8 = step8(s8, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    assert bool(m1["skipped"]) == bool(m8["skipped"]) == False  # noqa: E712
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(he8), np.asarray(he1),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)


@needs_8
def test_fused_sharded_compiles_without_feats_allgather(monkeypatch):
    """The compiled 8-device program must not all-gather anything bag-sized:
    correct numerics alone cannot distinguish partitioning from
    all-gather-and-replicate (both compute the right answer; one does it at
    1/8th the per-chip FLOPs and activation footprint)."""
    monkeypatch.setenv("MADELEINE_FORCE_FUSED", "1")
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=4)
    batch = _batch(ragged=False)
    mesh = make_mesh(8)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, mesh=mesh, donate=False)
    hlo = step.lower(state, shard_batch(batch, mesh),
                     jax.random.PRNGKey(0)).compile().as_text()
    feats_shard_elems = (BS // 8) * N_MOD * T * D
    assert_no_large_allgather(hlo, feats_shard_elems)


@needs_8
def test_unfused_sharded_compiles_without_feats_allgather():
    """Same assertion for the default (unfused, CPU) lane — guards the
    shard_map wrapper itself against regressions that reintroduce a gather."""
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=4)
    batch = _batch(ragged=False)
    mesh = make_mesh(8)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, mesh=mesh, donate=False)
    hlo = step.lower(state, shard_batch(batch, mesh),
                     jax.random.PRNGKey(0)).compile().as_text()
    feats_shard_elems = (BS // 8) * N_MOD * T * D
    assert_no_large_allgather(hlo, feats_shard_elems)
