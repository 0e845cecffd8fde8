"""Training-loop tests: step semantics, skip gating, schedule parity, sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models.madeleine import init_madeleine_params
from madeleine_tpu.parallel.mesh import make_mesh
from madeleine_tpu.train.optim import make_lr_schedule, make_optimizer
from madeleine_tpu.train.trainer import (
    TrainState,
    init_train_state,
    make_train_step,
    train_loop,
)

MODALITIES = ["HE", "HER2", "PGR"]


def _cfg(**kw):
    base = dict(
        patch_embedding_dim=12, wsi_encoder_hidden_dim=16,
        attention_hidden_dim=16, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=list(MODALITIES),
        temperature=0.01, lr=1e-3, max_epochs=4, warmup=True, warmup_epochs=1,
        batch_size=8, got_subsample=16,
        global_loss="info-nce", local_loss="got", symmetric_cl=True,
    )
    base.update(kw)
    return MadeleineConfig(**base).finalize()


def _batch(rng, bs=8, n_mod=3, t=24, d=12, all_he_only=False):
    feats = rng.standard_normal((bs, n_mod, t, d)).astype(np.float32)
    labels = np.ones((bs, n_mod), np.float32)
    if all_he_only:
        labels[:, 1:] = 0.0
    else:
        labels[:, 1] = (rng.random(bs) < 0.8).astype(np.float32)
        labels[:, 2] = (rng.random(bs) < 0.6).astype(np.float32)
    # zero out missing-stain features like the dataset placeholder does
    feats = feats * labels[:, :, None, None]
    return {
        "feats": jnp.asarray(feats),
        "modality_labels": jnp.asarray(labels),
        "sample_mask": jnp.ones(bs, bool),
    }


def test_loss_decreases_over_steps():
    cfg = _cfg(local_loss="-1")  # InfoNCE-only for speed
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)

    rng = np.random.default_rng(0)
    batch = _batch(rng)
    losses = []
    for i in range(12):
        state, _, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 12


def test_got_loss_in_training_step_finite():
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)
    batch = _batch(np.random.default_rng(1))
    state, he, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.all(np.isfinite(np.asarray(he)))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_he_only_batch_is_noop():
    """A batch with no usable stain pair must not change params or step count
    (ref python `continue`, trainer.py:120-122)."""
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)
    batch = _batch(np.random.default_rng(2), all_he_only=True)
    new_state, _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert bool(metrics["skipped"])
    assert int(new_state.step) == 0
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multiview_training_runs():
    cfg = _cfg(intra_modality_loss="info-nce", local_loss="-1")
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)
    batch = _batch(np.random.default_rng(3))
    state, _, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_lr_schedule_reference_shape():
    """warmup ramp -> one flat epoch -> cosine to end_lr (see train/optim.py)."""
    cfg = _cfg(lr=1e-4, max_epochs=10, warmup=True, warmup_epochs=2,
               end_learning_rate=1e-8)
    spe = 5
    sched = make_lr_schedule(cfg, spe)
    # ramp start: lr * 1e-5 (fp32 rounding)
    np.testing.assert_allclose(float(sched(0)), 1e-4 * 1e-5, rtol=1e-2)
    # end of ramp
    np.testing.assert_allclose(float(sched(2 * spe)), 1e-4, rtol=1e-5)
    # flat epoch
    np.testing.assert_allclose(float(sched(3 * spe - 1)), 1e-4, rtol=1e-5)
    # cosine tail reaches end lr at T_max = (max_epochs - warmup)*spe
    tail = float(sched(3 * spe + (10 - 2) * spe))
    np.testing.assert_allclose(tail, 1e-8, rtol=1e-2)
    # monotone decreasing after flat
    xs = [float(sched(i)) for i in range(3 * spe, 8 * spe)]
    assert all(a >= b for a, b in zip(xs, xs[1:]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_matches_single_device():
    """Mesh-sharded train step must produce the same loss and params as the
    unsharded one (global-batch InfoNCE semantics preserved)."""
    cfg = _cfg(local_loss="-1")
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    batch = _batch(np.random.default_rng(4), bs=16)

    state1 = init_train_state(params, tx)
    step1 = make_train_step(cfg, tx, donate=False)
    state1, he1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    state2 = init_train_state(params, tx)
    step2 = make_train_step(cfg, tx, mesh=mesh, donate=False)
    from madeleine_tpu.parallel.mesh import shard_batch

    state2, he2, m2 = step2(state2, shard_batch(batch, mesh),
                            jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(he2), np.asarray(he1),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_train_loop_end_to_end():
    cfg = _cfg(local_loss="-1")
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=3)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)
    rng = np.random.default_rng(5)
    batches = [_batch(rng) for _ in range(3)]
    state, ep_loss, rank, agg = train_loop(
        cfg, step, state, batches, epoch=0, rng_key=jax.random.PRNGKey(7))
    assert agg["n_steps"] == 3
    assert np.isfinite(ep_loss)
    assert rank > 1.0


def test_ragged_training_ignores_padding():
    """Padded ragged multistain batches with token masks: the step must be
    finite even when padding features are garbage, and InfoNCE-path gradients
    must match the trimmed-bag computation."""
    cfg = _cfg()  # infonce + got
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = init_train_state(params, tx)
    step = make_train_step(cfg, tx, donate=False)

    rng = np.random.default_rng(9)
    bs, n_mod, t, d = 4, 3, 40, 12
    feats = rng.standard_normal((bs, n_mod, t, d)).astype(np.float32)
    lengths = rng.integers(20, t, (bs, n_mod))
    token_mask = np.zeros((bs, n_mod, t), bool)
    for b in range(bs):
        for m in range(n_mod):
            token_mask[b, m, :lengths[b, m]] = True
    feats[~token_mask] = 1e6  # poison the padding
    batch = {
        "feats": jnp.asarray(feats),
        "modality_labels": jnp.ones((bs, n_mod), jnp.float32),
        "sample_mask": jnp.ones(bs, bool),
        "token_mask": jnp.asarray(token_mask),
    }
    new_state, he, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"])), "padding leaked into the loss"
    assert np.all(np.isfinite(np.asarray(he)))
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


class _PadPoisoner:
    """Wrap a ragged loader, overwriting padding features with garbage.

    If the real path (train_loop -> device batch -> step) forwards token_mask
    correctly, the poison is invisible; if the mask is dropped anywhere, the
    poisoned run diverges from the clean run."""

    def __init__(self, loader, value):
        self.loader, self.value = loader, value

    def set_epoch(self, epoch):
        self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            feats = batch["feats"].copy()
            feats[~batch["token_mask"]] = self.value
            yield dict(batch, feats=feats)


def test_train_loop_ragged_end_to_end_padding_invariant(tmp_path):
    """Drive the REAL full-bag path: SlideDataset(sample=-1) ->
    RaggedTrainLoader -> train_loop. The loop must forward token_mask, so a
    run with poisoned padding equals the clean run bit-for-bit."""
    from tests.test_data import _write_cohort
    from madeleine_tpu.data.datasets import RaggedTrainLoader, SlideDataset

    csv_path, feat_dir = _write_cohort(tmp_path, n_cases=5, d=12)
    cfg = _cfg(got_subsample=8)
    ds = SlideDataset("TEST", csv_path, feat_dir, MODALITIES,
                      embedding_size=12, sample=-1)
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=3)
    step = make_train_step(cfg, tx, donate=False)

    results = []
    for poison in (0.0, 1e6):
        loader = RaggedTrainLoader(ds, batch_size=2, buckets=(256,), seed=3)
        loader.set_epoch(0)
        state = init_train_state(params, tx)
        state, ep_loss, rank, agg = train_loop(
            cfg, step, state, _PadPoisoner(loader, poison), epoch=0,
            rng_key=jax.random.PRNGKey(11))
        assert np.isfinite(ep_loss) and ep_loss > 0.0, ep_loss
        results.append((ep_loss, state))
    (loss_a, state_a), (loss_b, state_b) = results
    np.testing.assert_array_equal(loss_a, loss_b)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_loop_dispatch_window_invariant(monkeypatch):
    """The bounded-dispatch path (materialize every output of the step
    leaving the window, trainer.py) must not change the epoch's results.
    A window of 1 forces the materialization branch on every step past the
    first; window 0 disables it entirely. Both runs must agree bit-for-bit
    on loss, rank, and final params."""
    cfg = _cfg(local_loss="-1")
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=6)
    step = make_train_step(cfg, tx, donate=False)
    rng = np.random.default_rng(13)
    batches = [_batch(rng) for _ in range(6)]

    results = []
    for window in ("0", "1"):
        monkeypatch.setenv("MADELEINE_DISPATCH_WINDOW", window)
        state = init_train_state(params, tx)
        state, ep_loss, rank, agg = train_loop(
            cfg, step, state, batches, epoch=0,
            rng_key=jax.random.PRNGKey(17))
        assert agg["n_steps"] == 6
        results.append((ep_loss, rank, state))
    (loss_a, rank_a, state_a), (loss_b, rank_b, state_b) = results
    np.testing.assert_array_equal(loss_a, loss_b)
    np.testing.assert_array_equal(rank_a, rank_b)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
