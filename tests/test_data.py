"""Data-pipeline tests: HDF5 IO, datasets, collate, bucketing, prefetch."""

import os

import numpy as np
import pandas as pd
import pytest

from madeleine_tpu.data import io as bag_io
from madeleine_tpu.data.datasets import (
    BucketedBagLoader,
    Prefetcher,
    SimpleDataset,
    SlideDataset,
    TrainLoader,
    collate,
)

MODALITIES = ["HE", "HER2", "PGR"]


def _write_cohort(tmp_path, n_cases=6, d=16, rng=None):
    """Synthetic multistain training cohort in the reference's file layout."""
    rng = rng or np.random.default_rng(0)
    feat_dir = tmp_path / "feats_h5"
    feat_dir.mkdir(exist_ok=True)
    rows = []
    for i in range(n_cases):
        sid = f"case{i}"
        labels = {"HE": 1}
        for m in MODALITIES[1:]:
            labels[m] = int(rng.random() < 0.7)
        for m, lab in labels.items():
            if lab:
                n = int(rng.integers(50, 200))
                bag_io.write_bag(str(feat_dir / f"{sid}_{m}.h5"),
                                 rng.standard_normal((n, d)).astype(np.float32))
        rows.append({"slide_id": sid, **labels, "split": "train"})
    csv_path = tmp_path / "cohort.csv"
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return str(csv_path), str(feat_dir)


def test_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((100, 8)).astype(np.float32)
    coords = rng.integers(0, 1000, (100, 2))
    p = str(tmp_path / "a.h5")
    bag_io.write_bag(p, feats, coords)
    np.testing.assert_array_equal(bag_io.load_features(p), feats)
    np.testing.assert_array_equal(bag_io.load_coords(p), coords)
    assert bag_io.bag_length(p) == 100

    p2 = str(tmp_path / "b.npz")
    bag_io.write_bag(p2, feats, coords)
    np.testing.assert_array_equal(bag_io.load_features(p2), feats)
    assert bag_io.bag_length(p2) == 100


def test_io_append(tmp_path):
    p = str(tmp_path / "stream.h5")
    rng = np.random.default_rng(1)
    chunks = [rng.standard_normal((n, 4)).astype(np.float32) for n in (10, 20, 5)]
    for c in chunks:
        bag_io.append_bag(p, c)
    np.testing.assert_allclose(bag_io.load_features(p),
                               np.concatenate(chunks), rtol=1e-6)


def test_io_squeezes_leading_singleton(tmp_path):
    """Reference readers squeeze a leading [1, n, d] dim (wsi_dataset.py:16)."""
    p = str(tmp_path / "c.h5")
    feats = np.random.default_rng(2).standard_normal((1, 30, 8)).astype(np.float32)
    bag_io.write_bag(p, feats)
    assert bag_io.load_features(p).shape == (30, 8)
    assert bag_io.bag_length(p) == 30


def test_slide_dataset_and_collate(tmp_path):
    csv_path, feat_dir = _write_cohort(tmp_path)
    ds = SlideDataset("TEST", csv_path, feat_dir, MODALITIES,
                      embedding_size=16, sample=64)
    assert len(ds) == 6
    item = ds[0]
    assert len(item["feats"]) == len(MODALITIES)
    for f in item["feats"]:
        assert f.shape == (64, 16)  # subsample makes all bags fixed-length

    batch = collate([ds[i] for i in range(4)])
    assert batch["feats"].shape == (4, 3, 64, 16)
    assert batch["modality_labels"].shape == (4, 3)
    # missing stains are zero placeholders
    for b in range(4):
        for m in range(3):
            if batch["modality_labels"][b, m] == 0:
                assert np.all(batch["feats"][b, m] == 0)


def test_train_loader_pads_final_batch(tmp_path):
    csv_path, feat_dir = _write_cohort(tmp_path, n_cases=7)
    ds = SlideDataset("TEST", csv_path, feat_dir, MODALITIES,
                      embedding_size=16, sample=32)
    loader = TrainLoader(ds, batch_size=4, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    assert all(b["feats"].shape[0] == 4 for b in batches)
    # padded rows are fully masked
    assert batches[1]["sample_mask"].sum() == 3
    assert np.all(batches[1]["modality_labels"][3] == 0)


def test_simple_dataset(tmp_path):
    rng = np.random.default_rng(3)
    d = tmp_path / "bags"
    d.mkdir()
    for i in range(3):
        bag_io.write_bag(str(d / f"s{i}.h5"),
                         rng.standard_normal((10 + i, 4)).astype(np.float32))
    ds = SimpleDataset(str(d))
    assert len(ds) == 3
    feats, sid = ds[1]
    assert sid == "s1"
    assert feats.shape == (11, 4)


def test_bucketed_loader_covers_all_slides(tmp_path):
    rng = np.random.default_rng(4)
    d = tmp_path / "bags"
    d.mkdir()
    lengths = [100, 600, 1100, 3000, 5000, 120, 900]
    for i, n in enumerate(lengths):
        bag_io.write_bag(str(d / f"s{i}.h5"),
                         rng.standard_normal((n, 8)).astype(np.float32))
    loader = BucketedBagLoader(str(d), buckets=(512, 1024, 2048, 8192),
                               tokens_per_batch=16384, max_batch=8)
    seen = {}
    for batch in loader:
        feats, mask = batch["feats"], batch["mask"]
        assert feats.shape[0] == mask.shape[0]
        for j, sid in enumerate(batch["slide_ids"]):
            n_valid = int(mask[j].sum())
            seen[sid] = n_valid
            # masked-off region must be zero padding
            assert np.all(feats[j][~mask[j]] == 0)
        # batch-dim padding rows beyond n_valid are fully masked
        for j in range(batch["n_valid"], feats.shape[0]):
            assert mask[j].sum() == 0
    assert seen == {f"s{i}": n for i, n in enumerate(lengths)}


def test_bucketed_loader_grows_bucket_for_oversized(tmp_path):
    """Bags beyond the top bucket run WHOLE in a grown pow2 bucket — never
    silently truncated (ref eval runs bags uncapped, wsi_dataset.py:71-76)."""
    rng = np.random.default_rng(5)
    d = tmp_path / "bags"
    d.mkdir()
    bag_io.write_bag(str(d / "big.h5"),
                     rng.standard_normal((700, 4)).astype(np.float32))
    bag_io.write_bag(str(d / "huge.h5"),
                     rng.standard_normal((2100, 4)).astype(np.float32))
    loader = BucketedBagLoader(str(d), buckets=(256, 512), tokens_per_batch=4096)
    batches = {int(b["mask"][0].sum()): b for b in loader}
    assert set(batches) == {700, 2100}
    assert batches[700]["feats"].shape[1] == 1024   # 512 doubled once
    assert batches[2100]["feats"].shape[1] == 4096  # doubled to cover 2100


def test_oversize_bag_encodes_whole_and_matches_unfused(tmp_path):
    """End-to-end: a bag longer than the top default bucket (65,536) encodes
    exactly, matching the direct full-length pool — zero dropped tokens."""
    import jax
    import jax.numpy as jnp
    from madeleine_tpu.config import MadeleineConfig
    from madeleine_tpu.eval.inference import run_inference
    from madeleine_tpu.models import madeleine as mtm
    from madeleine_tpu.models.madeleine import init_madeleine_params

    n = 65536 + 700
    rng = np.random.default_rng(6)
    d = tmp_path / "bags"
    d.mkdir()
    feats = rng.standard_normal((n, 8)).astype(np.float32)
    bag_io.write_bag(str(d / "giant.h5"), feats)

    cfg = MadeleineConfig(
        patch_embedding_dim=8, wsi_encoder_hidden_dim=16,
        attention_hidden_dim=16, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=["HE"],
    ).finalize()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    loader = BucketedBagLoader(str(d))
    out, _ = run_inference(params, cfg, loader, verbose=False)
    assert out["slide_ids"] == ["giant"]
    want = np.asarray(mtm.encode(params, cfg, jnp.asarray(feats)[None]))
    np.testing.assert_allclose(out["embeds"], want, rtol=1e-5, atol=1e-5)


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(Prefetcher(gen()))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetcher_order():
    items = list(range(20))
    assert list(Prefetcher(items, depth=3)) == items


def test_ragged_train_loader(tmp_path):
    from madeleine_tpu.data.datasets import RaggedTrainLoader

    csv_path, feat_dir = _write_cohort(tmp_path, n_cases=5)
    ds = SlideDataset("TEST", csv_path, feat_dir, MODALITIES,
                      embedding_size=16, sample=-1)
    loader = RaggedTrainLoader(ds, batch_size=2, buckets=(64, 256),
                               shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        bs, n_mod, t, d = b["feats"].shape
        assert (bs, n_mod, d) == (2, 3, 16)
        assert t in (64, 256)
        # masked-off padding is zero; valid counts match bag lengths
        assert np.all(b["feats"][~b["token_mask"]] == 0)
        assert b["token_mask"].any(axis=-1).all() or not b["sample_mask"].all()
    # final batch padding is masked out
    assert batches[-1]["sample_mask"].sum() == 1
    loader.set_epoch(3)  # deterministic reseed API exists
