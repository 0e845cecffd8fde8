"""Mesh-parallel tests on the 8-virtual-device CPU backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.models.madeleine import init_madeleine_params
from madeleine_tpu.ops import losses as L
from madeleine_tpu.parallel.bag_parallel import encode_bag_parallel
from madeleine_tpu.parallel.mesh import BAG_AXIS, DATA_AXIS, make_mesh

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


def _cfg(add_se=False):
    return MadeleineConfig(
        patch_embedding_dim=16, wsi_encoder_hidden_dim=32,
        attention_hidden_dim=32, n_heads=2, precision="float32",
        add_stain_encoding=add_se,
        dataset="__test__", MODALITIES=["HE", "X", "Y"],
    ).finalize()


@needs_8
@pytest.mark.parametrize("add_se", [False, True])
def test_bag_parallel_matches_single_device(add_se):
    """Token-sharded pooling over 8 devices == single-device encode."""
    cfg = _cfg(add_se)
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t, d = 2, 8 * 37, 16
    feats = jnp.asarray(rng.standard_normal((b, t, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, t)) < 0.9)

    want = mtm.encode(params, cfg, feats, stain_idx=1 if add_se else 0,
                      mask=mask)
    mesh = make_mesh(8, axis_names=(BAG_AXIS,))
    got = encode_bag_parallel(params, cfg, feats, mesh, mask=mask,
                              stain_idx=1 if add_se else 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@needs_8
def test_info_nce_global_matches_local():
    """shard_map all-gather InfoNCE == single-device InfoNCE on the full batch."""
    try:
        from jax import shard_map as shard_map_fn
    except ImportError:
        from jax.experimental.shard_map import shard_map as shard_map_fn
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    mask = jnp.asarray(rng.random(16) < 0.8)

    want = float(L.info_nce(q, k, temperature=0.01, symmetric=True, mask=mask))

    mesh = make_mesh(8)
    fn = shard_map_fn(
        lambda q, k, m: L.info_nce_global(
            q, k, axis_name=DATA_AXIS, temperature=0.01, symmetric=True, mask=m),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
    )
    got = float(fn(q, k, mask))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@needs_8
def test_info_nce_global_gradients():
    """Grad of the shard_map global InfoNCE w.r.t. local shards must equal the
    single-device gradient restricted to those shards."""
    try:
        from jax import shard_map as shard_map_fn
    except ImportError:
        from jax.experimental.shard_map import shard_map as shard_map_fn
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((16, 8)).astype(np.float32))

    def loss_single(q, k):
        return L.info_nce(q, k, temperature=0.05, symmetric=True)

    g_want = jax.grad(loss_single, argnums=(0, 1))(q, k)

    mesh = make_mesh(8)

    def loss_sharded(q, k):
        fn = shard_map_fn(
            lambda q, k: L.info_nce_global(q, k, axis_name=DATA_AXIS,
                                           temperature=0.05, symmetric=True),
            mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)), out_specs=P())
        return fn(q, k)

    g_got = jax.grad(loss_sharded, argnums=(0, 1))(q, k)
    for a, b in zip(g_want, g_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


@needs_8
def test_stain_encoding_sharded_train_step():
    """BASELINE config 5: stain-encoding pretraining with cross-chip
    contrastive all-gather — sharded step == single-device step."""
    from madeleine_tpu.parallel.mesh import shard_batch
    from madeleine_tpu.train.optim import make_optimizer
    from madeleine_tpu.train.trainer import init_train_state, make_train_step

    cfg = MadeleineConfig(
        patch_embedding_dim=12, wsi_encoder_hidden_dim=16,
        attention_hidden_dim=16, n_heads=2, precision="float32",
        add_stain_encoding=True, temperature=0.01, lr=1e-3,
        global_loss="info-nce", symmetric_cl=True, local_loss="-1",
        dataset="__test__", MODALITIES=["HE", "X", "Y"], max_epochs=2,
        warmup=True, warmup_epochs=1, batch_size=16,
    ).finalize()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=4)

    rng = np.random.default_rng(11)
    bs, n_mod, t, d = 16, 3, 20, 12
    batch = {
        "feats": jnp.asarray(rng.standard_normal((bs, n_mod, t, d)),
                             jnp.float32),
        "modality_labels": jnp.ones((bs, n_mod), jnp.float32),
        "sample_mask": jnp.ones(bs, bool),
    }

    s1 = init_train_state(params, tx)
    step1 = make_train_step(cfg, tx, donate=False)
    s1, he1, m1 = step1(s1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(8)
    s2 = init_train_state(params, tx)
    step2 = make_train_step(cfg, tx, mesh=mesh, donate=False)
    s2, he2, m2 = step2(s2, shard_batch(batch, mesh), jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]), rtol=1e-5)
    # stain-encoding table must receive identical gradients
    np.testing.assert_allclose(
        np.asarray(s2.params["embedding"]["table"]),
        np.asarray(s1.params["embedding"]["table"]), rtol=1e-5, atol=1e-7)
