"""End-to-end inference + linear probing over synthetic bags."""

import os

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.data.io import write_bag
from madeleine_tpu.eval.inference import get_downstream_loader, run_inference
from madeleine_tpu.eval.linear_probe import eval_single_task
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.models.madeleine import init_madeleine_params
from madeleine_tpu.utils.file_utils import save_pkl


def _tiny_cfg(d=16):
    return MadeleineConfig(
        patch_embedding_dim=d, wsi_encoder_hidden_dim=32,
        attention_hidden_dim=32, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=["HE", "X"],
    ).finalize()


def test_run_inference_matches_direct_encode(tmp_path):
    """Bucketed/padded batch inference must equal per-slide unpadded encode."""
    rng = np.random.default_rng(0)
    d = 16
    bag_dir = tmp_path / "patch_embeddings"
    bag_dir.mkdir()
    lengths = [37, 90, 130, 260, 55]
    bags = {}
    for i, n in enumerate(lengths):
        f = rng.standard_normal((n, d)).astype(np.float32)
        bags[f"s{i}"] = f
        write_bag(str(bag_dir / f"s{i}.h5"), f)

    cfg = _tiny_cfg(d)
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    loader = get_downstream_loader(str(tmp_path), buckets=(64, 128, 512),
                                   tokens_per_batch=1024)
    res, rank = run_inference(params, cfg, loader, verbose=False)
    assert sorted(res["slide_ids"]) == sorted(bags)
    assert res["embeds"].shape == (5, cfg.embed_dim)
    assert rank > 0

    by_id = dict(zip(res["slide_ids"], res["embeds"]))
    for sid, f in bags.items():
        want = np.asarray(mtm.encode_he(params, cfg, jnp.asarray(f[None])))[0]
        np.testing.assert_allclose(by_id[sid], want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"slide {sid}")


def test_repeated_inference_zero_recompiles(tmp_path):
    """A second run_inference with an EQUAL (freshly constructed) config must
    reuse every compiled executable — configs are cache-keyed by content, not
    object identity (identity keying re-traced per call)."""
    from madeleine_tpu.eval.inference import _encode_jit

    rng = np.random.default_rng(4)
    d = 16
    bag_dir = tmp_path / "patch_embeddings"
    bag_dir.mkdir()
    for i, n in enumerate([40, 80]):
        write_bag(str(bag_dir / f"s{i}.h5"),
                  rng.standard_normal((n, d)).astype(np.float32))

    params = init_madeleine_params(jax.random.PRNGKey(0), _tiny_cfg(d))

    def run():
        loader = get_downstream_loader(str(tmp_path), buckets=(64, 128),
                                       tokens_per_batch=512)
        # fresh config object each call, equal content
        return run_inference(params, _tiny_cfg(d), loader, verbose=False)

    res1, _ = run()
    n_compiled = _encode_jit._cache_size()
    res2, _ = run()
    assert _encode_jit._cache_size() == n_compiled, "second call re-traced"
    order = np.argsort(res1["slide_ids"]), np.argsort(res2["slide_ids"])
    np.testing.assert_allclose(res1["embeds"][order[0]],
                               res2["embeds"][order[1]], rtol=1e-6)


def test_linear_probe_separable(tmp_path):
    """Probing protocol recovers a linearly separable synthetic task."""
    rng = np.random.default_rng(1)
    n, dim = 120, 8
    y = rng.integers(0, 2, n)
    x = rng.standard_normal((n, dim)).astype(np.float32) + 3.0 * y[:, None]
    ids = [f"s{i}" for i in range(n)]
    pkl = str(tmp_path / "emb.pkl")
    save_pkl(pkl, {"embeds": x, "slide_ids": ids})
    csv = str(tmp_path / "labels.csv")
    pd.DataFrame({"slide_id": ids, "er": y}).to_csv(csv, index=False)

    metrics = eval_single_task(pkl, csv, ["er"], ks=(10,), num_folds=3,
                               verbose=False, save=True)
    aucs = metrics[(10, "er")]["auc"]
    assert len(aucs) == 3
    assert np.mean(aucs) > 0.95
    # reference-layout results pickle exists
    assert os.path.exists(
        str(tmp_path / "res_linear_probing" / "emb" / "k=10_probing_er.pickle"))


def test_linear_probe_drops_minus_one_labels(tmp_path):
    rng = np.random.default_rng(2)
    n, dim = 60, 4
    y = rng.integers(0, 2, n)
    y[:10] = -1  # unknown labels must be excluded (ref: run_linear_probing.py:141)
    x = rng.standard_normal((n, dim)).astype(np.float32) + 2.0 * np.maximum(y, 0)[:, None]
    ids = [f"s{i}" for i in range(n)]
    pkl = str(tmp_path / "emb.pkl")
    save_pkl(pkl, {"embeds": x, "slide_ids": ids})
    csv = str(tmp_path / "labels.csv")
    pd.DataFrame({"slide_id": ids, "her2": y}).to_csv(csv, index=False)
    metrics = eval_single_task(pkl, csv, ["her2"], ks=(5,), num_folds=2,
                               verbose=False, save=False)
    assert np.all(np.isfinite(metrics[(5, "her2")]["auc"]))


def test_run_inference_sharded_matches_single(tmp_path):
    """Mesh-sharded inference must produce identical embeddings."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from madeleine_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    d = 16
    bag_dir = tmp_path / "patch_embeddings"
    bag_dir.mkdir()
    for i in range(17):
        write_bag(str(bag_dir / f"s{i}.h5"),
                  rng.standard_normal((int(rng.integers(20, 120)), d)
                                      ).astype(np.float32))
    cfg = _tiny_cfg(d)
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)

    def make_loader():
        return get_downstream_loader(str(tmp_path), buckets=(128,),
                                     tokens_per_batch=1024)

    res1, _ = run_inference(params, cfg, make_loader(), verbose=False)
    mesh = make_mesh(8)
    res2, _ = run_inference(params, cfg, make_loader(), mesh=mesh,
                            verbose=False)
    assert res1["slide_ids"] == res2["slide_ids"]
    np.testing.assert_allclose(res2["embeds"], res1["embeds"],
                               rtol=1e-5, atol=1e-6)
