"""End-to-end learning validation (CPU analog of the BCNB AUC protocol).

Synthetic multistain cohort with a shared per-case latent: HE and IHC bags of
the same case are generated from the same latent code. After a short
contrastive pretrain, HE slide embeddings must (a) show decreasing loss,
(b) keep a healthy rank, and (c) linearly separate a label carried by the
latent far better than embeddings from the untrained model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.models.madeleine import init_madeleine_params
from madeleine_tpu.ops.rank import smooth_rank_measure
from madeleine_tpu.train.optim import make_optimizer
from madeleine_tpu.train.trainer import init_train_state, make_train_step

D, T, N_CASES, BS = 24, 48, 48, 12
MODALITIES = ["HE", "IHC1", "IHC2"]


def _make_cohort(rng):
    """Latent z per case; each stain's tokens = stain-specific linear map of z
    + token noise; label = sign of z[0]."""
    n_mod = len(MODALITIES)
    z = rng.standard_normal((N_CASES, 8)).astype(np.float32)
    maps = rng.standard_normal((n_mod, 8, D)).astype(np.float32)
    feats = np.zeros((N_CASES, n_mod, T, D), np.float32)
    for c in range(N_CASES):
        for m in range(n_mod):
            base = z[c] @ maps[m]
            feats[c, m] = base[None, :] + 0.8 * rng.standard_normal((T, D))
    labels = (z[:, 0] > 0).astype(int)
    return feats, labels


def _probe_auc(embs, labels, rng):
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score

    idx = rng.permutation(len(labels))
    tr, te = idx[: len(idx) // 2], idx[len(idx) // 2:]
    if len(np.unique(labels[tr])) < 2 or len(np.unique(labels[te])) < 2:
        return 0.5
    clf = LogisticRegression(C=1, max_iter=5000).fit(embs[tr], labels[tr])
    return roc_auc_score(labels[te], clf.predict_proba(embs[te])[:, 1])


@pytest.mark.slow
def test_pretraining_improves_downstream_probing():
    rng = np.random.default_rng(0)
    feats, labels = _make_cohort(rng)

    cfg = MadeleineConfig(
        patch_embedding_dim=D, wsi_encoder_hidden_dim=32,
        attention_hidden_dim=32, n_heads=2, precision="float32",
        dataset="__synth__", MODALITIES=list(MODALITIES),
        temperature=0.05, lr=2e-4, batch_size=BS, max_epochs=30,
        warmup=True, warmup_epochs=2, global_loss="info-nce",
        local_loss="-1", symmetric_cl=True,
    ).finalize()

    params0 = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=N_CASES // BS)
    state = init_train_state(params0, tx)
    step = make_train_step(cfg, tx, donate=False)

    mod_labels = jnp.ones((BS, len(MODALITIES)), jnp.float32)
    losses = []
    order_rng = np.random.default_rng(1)
    for epoch in range(cfg.max_epochs):
        order = order_rng.permutation(N_CASES)
        for s in range(0, N_CASES, BS):
            batch = {
                "feats": jnp.asarray(feats[order[s:s + BS]]),
                "modality_labels": mod_labels,
                "sample_mask": jnp.ones(BS, bool),
            }
            state, _, metrics = step(
                state, batch, jax.random.fold_in(jax.random.PRNGKey(2),
                                                 epoch * 100 + s))
            losses.append(float(metrics["loss"]))

    assert losses[-1] < 0.5 * np.mean(losses[:4]), (losses[:4], losses[-4:])

    he = jnp.asarray(feats[:, 0])
    emb_trained = np.asarray(mtm.encode_he(state.params, cfg, he))
    emb_init = np.asarray(mtm.encode_he(params0, cfg, he))

    rank = float(smooth_rank_measure(jnp.asarray(emb_trained)))
    assert rank > 2.0, f"rank collapse: {rank}"

    eval_rng = np.random.default_rng(3)
    auc_tr = np.mean([_probe_auc(emb_trained, labels,
                                 np.random.default_rng(i)) for i in range(5)])
    auc_0 = np.mean([_probe_auc(emb_init, labels,
                                np.random.default_rng(i)) for i in range(5)])
    # trained embeddings must encode the shared latent clearly
    assert auc_tr > 0.8, f"trained AUC {auc_tr}"
    assert auc_tr >= auc_0 - 0.05, (auc_tr, auc_0)
