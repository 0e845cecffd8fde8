"""setup_* family, SegDataset, multi-view consistency, and the
extract_slide_embeddings CLI end-to-end."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp

from madeleine_tpu import setup as S
from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models.madeleine import init_madeleine_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_setup_family(tmp_path):
    from madeleine_tpu.data.io import write_bag

    rng = np.random.default_rng(0)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rows = []
    for i in range(4):
        sid = f"c{i}"
        for m in ("HE", "HER2", "PGR", "KI67", "ER"):
            write_bag(str(feat_dir / f"{sid}_{m}.h5"),
                      rng.standard_normal((30, 8)).astype(np.float32))
        rows.append({"slide_id": sid, "HE": 1, "HER2": 1, "PGR": 1,
                     "KI67": 1, "ER": 1, "split": "train"})
    csv = str(tmp_path / "ACROBAT.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    cfg = S.setup(["--dataset", "ACROBAT", "--csv_fpath", csv,
                   "--data_root_dir", str(feat_dir),
                   "--results_dir", str(tmp_path / "res"),
                   "--patch_embedding_dim", "8",
                   "--wsi_encoder_hidden_dim", "16", "--n_heads", "2",
                   "--batch_size", "2", "--n_subsamples", "16",
                   "--global_loss", "info-nce", "--local_loss", "got",
                   "--intra_modality_loss", "info-nce", "--warmup"])
    assert cfg.STAINS == ["HER2", "PGR", "KI67", "ER"]
    assert os.path.exists(os.path.join(cfg.RESULTS_SAVE_PATH, "config.json"))

    ds = S.setup_dataset(cfg)
    loader = S.setup_dataloader(cfg, ds)
    assert len(loader) == 2
    params = S.setup_model(cfg)
    assert "wsi_embedders" in params
    tx, sched = S.setup_optim(cfg, len(loader))
    assert float(sched(0)) > 0
    g, l, i = S.setup_losses(cfg)
    assert g is not None and l is not None and i is not None
    down = S.setup_downstream_datasets(cfg, {"X": str(feat_dir)})
    assert "X" in down


def test_seg_datasets(tmp_path):
    from PIL import Image

    from madeleine_tpu.preprocessing.patching import WSIPatcher
    from madeleine_tpu.preprocessing.seg_dataset import (SegFileDataset,
                                                         SegWSIDataset)

    img = np.full((512, 512, 3), 100, np.uint8)
    patcher = WSIPatcher(img, patch_size=128, src_pixel_size=1.0)
    ds = SegWSIDataset(patcher, batch_size=3)
    batches = list(ds)
    n = sum(b[0].shape[0] for b in batches)
    assert n == len(patcher) == 16
    assert batches[0][0].shape == (3, 128, 128, 3)

    tdir = tmp_path / "tiles"
    tdir.mkdir()
    for (x, y) in [(0, 0), (128, 0), (0, 128)]:
        Image.fromarray(img[:64, :64]).save(str(tdir / f"t_{x}_{y}.png"))
    fds = SegFileDataset(str(tdir), batch_size=2)
    batches = list(fds)
    assert sum(b[0].shape[0] for b in batches) == 3
    assert tuple(batches[0][1][0]) == (0, 0)


def test_multiview_internal_consistency():
    """Whole view must equal n_views=1 pooling; half views must pool over
    complementary token subsets (ref semantics: Model.py:419-440)."""
    from madeleine_tpu.models.abmil import abmil_embed, init_abmil_params

    rng = np.random.default_rng(0)
    params = init_abmil_params(jax.random.PRNGKey(0), 16, 16, 2,
                               attn_hidden_dim=16)
    bags = jnp.asarray(rng.standard_normal((3, 40, 16)).astype(np.float32))

    whole = abmil_embed(params, bags, n_heads=2)
    views = abmil_embed(params, bags, n_heads=2, n_views=3,
                        view_rng=jax.random.PRNGKey(5))
    assert views.shape == (3, 3, 2, 16)
    np.testing.assert_allclose(np.asarray(views[:, 0]), np.asarray(whole),
                               rtol=1e-5, atol=1e-6)
    # Each half view is a proper softmax pooling: reproduce with explicit masks
    perm = jax.random.permutation(jax.random.PRNGKey(5), 40)
    ranks = jnp.zeros((40,), jnp.int32).at[perm].set(jnp.arange(40))
    half1 = ranks < 20
    v1 = abmil_embed(params, bags, n_heads=2, mask=half1[None, :])
    v2 = abmil_embed(params, bags, n_heads=2, mask=(~half1)[None, :])
    np.testing.assert_allclose(np.asarray(views[:, 1]), np.asarray(v1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(views[:, 2]), np.asarray(v2),
                               rtol=1e-5, atol=1e-6)


def test_extract_slide_embeddings_cli(tmp_path):
    """Full CLI: local checkpoint dir -> pkl with reference schema."""
    from madeleine_tpu.data.io import write_bag
    from madeleine_tpu.train.checkpoint import save_best_torch

    rng = np.random.default_rng(1)
    cfg = MadeleineConfig(
        patch_embedding_dim=8, wsi_encoder_hidden_dim=16,
        attention_hidden_dim=16, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=["HE", "X"],
    ).finalize()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    model_dir = tmp_path / "models" / "MADELEINE"
    model_dir.mkdir(parents=True)
    save_best_torch(str(model_dir), params, cfg)

    data_dir = tmp_path / "data" / "patch_embeddings"
    data_dir.mkdir(parents=True)
    for i in range(3):
        write_bag(str(data_dir / f"s{i}.h5"),
                  rng.standard_normal((20 + i, 8)).astype(np.float32))

    env = dict(os.environ, MADELEINE_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "extract_slide_embeddings.py"),
         "--local_dir", str(tmp_path / "data"),
         "--model_dir", str(tmp_path / "models"), "--no_download"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    import pickle

    with open(str(tmp_path / "data" / "madeleine_slide_embeddings.pkl"),
              "rb") as f:
        res = pickle.load(f)
    assert sorted(res["slide_ids"]) == ["s0", "s1", "s2"]
    assert res["embeds"].shape == (3, 16)


def test_attention_heatmap(tmp_path):
    from madeleine_tpu.eval.heatmap import attention_to_grid, save_heatmap

    rng = np.random.default_rng(3)
    n = 30
    cells = rng.choice(80, n, replace=False)  # unique grid cells (10 x 8)
    coords = np.stack([(cells % 10) * 256, (cells // 10) * 256], axis=1)
    attn = rng.standard_normal((n, 4)).astype(np.float32)
    grid, origin = attention_to_grid(coords, attn, 256)
    assert grid.shape[-1] == 4
    # softmax weights sum to 1 per head over valid cells
    s = np.nansum(grid, axis=(0, 1))
    np.testing.assert_allclose(s, 1.0, rtol=1e-5)

    out = save_heatmap(str(tmp_path / "h.png"), coords, attn, 256)
    assert os.path.exists(out)
    thumb = np.full((64, 80, 3), 200, np.uint8)
    out2 = save_heatmap(str(tmp_path / "h2.png"), coords, attn, 256,
                        thumbnail=thumb, head=1)
    assert os.path.exists(out2)
