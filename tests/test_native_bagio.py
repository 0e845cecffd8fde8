"""Native bagio tests: format roundtrip, gather correctness, threaded assembly,
and the native train loader vs the pure-python loader."""

import os

import numpy as np
import pandas as pd
import pytest

from madeleine_tpu.native import bagio


@pytest.fixture(scope="module")
def native_lib():
    lib = bagio.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_write_read_roundtrip_f32(tmp_path, native_lib):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((100, 32)).astype(np.float32)
    coords = rng.integers(0, 10000, (100, 2)).astype(np.int64)
    p = str(tmp_path / "a.bag")
    bagio.write_bag_file(p, feats, coords)
    r = bagio.BagReader(p)
    assert (r.n_rows, r.n_cols) == (100, 32)
    np.testing.assert_array_equal(r.read_all(), feats)
    idx = np.array([0, 5, 99, 5], np.int64)
    np.testing.assert_array_equal(r.gather(idx), feats[idx])
    r.close()


def test_bf16_storage_roundtrip(tmp_path, native_lib):
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((50, 16)).astype(np.float32)
    p = str(tmp_path / "b.bag")
    bagio.write_bag_file(p, feats, dtype="bfloat16")
    r = bagio.BagReader(p)
    got = r.read_all()
    # bf16 round-trip error bounded by ~2^-8 relative
    np.testing.assert_allclose(got, feats, rtol=8e-3, atol=8e-3)
    r.close()


def test_numpy_fallback_reader_matches_native(tmp_path, native_lib):
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((30, 8)).astype(np.float32)
    p = str(tmp_path / "c.bag")
    bagio.write_bag_file(p, feats)
    np_feats, _ = bagio._read_bag_numpy(p)
    np.testing.assert_array_equal(np_feats, feats)


def test_out_of_range_rows_zero_filled(tmp_path, native_lib):
    feats = np.ones((10, 4), np.float32)
    p = str(tmp_path / "d.bag")
    bagio.write_bag_file(p, feats)
    r = bagio.BagReader(p)
    out = r.gather(np.array([0, 10, -1, 3], np.int64))
    np.testing.assert_array_equal(out[0], 1.0)
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_array_equal(out[2], 0.0)
    r.close()


def test_assemble_batch_parallel(tmp_path, native_lib):
    rng = np.random.default_rng(3)
    readers, all_feats = [], []
    for i in range(12):
        feats = rng.standard_normal((40 + i, 16)).astype(np.float32)
        p = str(tmp_path / f"bag{i}.bag")
        bagio.write_bag_file(p, feats)
        readers.append(bagio.BagReader(p))
        all_feats.append(feats)
    readers[4] = None  # missing stain -> zeros
    indices = rng.integers(0, 40, (12, 24)).astype(np.int64)
    out = bagio.assemble_batch(readers, indices, 16, n_threads=4)
    for k in range(12):
        if k == 4:
            np.testing.assert_array_equal(out[k], 0.0)
        else:
            np.testing.assert_array_equal(out[k], all_feats[k][indices[k]])
    # repeated invocation (pool reuse) stays correct
    out2 = bagio.assemble_batch(readers, indices, 16, n_threads=4)
    np.testing.assert_array_equal(out2, out)


def test_convert_h5_to_bag(tmp_path, native_lib):
    from madeleine_tpu.data.io import write_bag

    rng = np.random.default_rng(4)
    feats = rng.standard_normal((60, 8)).astype(np.float32)
    coords = rng.integers(0, 100, (60, 2))
    h5 = str(tmp_path / "x.h5")
    write_bag(h5, feats, coords)
    bag = bagio.convert_to_bag(h5)
    r = bagio.BagReader(bag)
    np.testing.assert_array_equal(r.read_all(), feats)
    r.close()


def test_native_train_loader_matches_python(tmp_path, native_lib):
    """NativeTrainLoader output == TrainLoader output under the same RNG."""
    from madeleine_tpu.data.datasets import SlideDataset, TrainLoader
    from madeleine_tpu.data.io import write_bag
    from madeleine_tpu.native.dataset import NativeTrainLoader

    rng = np.random.default_rng(5)
    mods = ["HE", "X", "Y"]
    h5_dir = tmp_path / "h5"
    h5_dir.mkdir()
    rows = []
    for i in range(7):
        sid = f"c{i}"
        labs = {"HE": 1, "X": int(rng.random() < 0.7), "Y": 1}
        for m, lab in labs.items():
            if lab:
                feats = rng.standard_normal(
                    (int(rng.integers(20, 60)), 8)).astype(np.float32)
                write_bag(str(h5_dir / f"{sid}_{m}.h5"), feats)
                bagio.convert_to_bag(str(h5_dir / f"{sid}_{m}.h5"),
                                     str(h5_dir / f"{sid}_{m}.bag"))
        rows.append({"slide_id": sid, **labs, "split": "train"})
    csv = str(tmp_path / "c.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    kw = dict(batch_size=4, shuffle=True)
    ds = SlideDataset("T", csv, str(h5_dir), mods, embedding_size=8,
                      sample=16, rng=np.random.default_rng(42))
    py_loader = TrainLoader(ds, rng=np.random.default_rng(7), **kw)
    nat_loader = NativeTrainLoader(csv, str(h5_dir), mods, 8, 16,
                                   rng=np.random.default_rng(99), **kw)

    py_batches = list(py_loader)
    nat_batches = list(nat_loader)
    assert len(py_batches) == len(nat_batches) == 2
    for pb, nb in zip(py_batches, nat_batches):
        assert pb["feats"].shape == nb["feats"].shape == (4, 3, 16, 8)
        assert pb["modality_labels"].shape == nb["modality_labels"].shape
    # same RNG stream -> identical batches between native loader runs
    nat_loader2 = NativeTrainLoader(csv, str(h5_dir), mods, 8, 16,
                                    rng=np.random.default_rng(99), **kw)
    for a, b in zip(nat_batches, list(nat_loader2)):
        np.testing.assert_array_equal(a["feats"], b["feats"])
    nat_loader.close()


def test_native_loader_batches_survive_prefetch(tmp_path, native_lib):
    """Regression: the loader used one shared output buffer, so holding a
    batch while later ones were produced (exactly what Prefetcher does)
    silently replaced its features. Batches must stay valid while at least
    buffer_depth - 1 newer batches are produced."""
    from madeleine_tpu.data.datasets import Prefetcher
    from madeleine_tpu.native.dataset import NativeTrainLoader

    rng = np.random.default_rng(11)
    mods = ["HE", "X"]
    rows = []
    for i in range(12):
        sid = f"c{i}"
        for m in mods:
            bagio.write_bag_file(
                str(tmp_path / f"{sid}_{m}.bag"),
                rng.standard_normal((30, 8)).astype(np.float32))
        rows.append({"slide_id": sid, "HE": 1, "X": 1, "split": "train"})
    csv = str(tmp_path / "c.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    def make():
        return NativeTrainLoader(csv, str(tmp_path), mods, 8, 16,
                                 batch_size=2, shuffle=False,
                                 rng=np.random.default_rng(0), seed=0)

    expected = [b["feats"].copy() for b in make()]
    assert len(expected) == 6

    # deterministic: a yielded batch must survive buffer_depth - 1 further
    # productions (Prefetcher depth 2 keeps <= 3 batches in flight past it)
    loader = make()
    it = iter(loader)
    b0 = next(it)["feats"]
    e0 = b0.copy()
    for _ in range(loader._buf_depth - 1):
        next(it)
    np.testing.assert_array_equal(
        b0, e0, err_msg="yielded batch was overwritten by later assembly")

    # the real consumer path: batches read through a Prefetcher match
    for k, b in enumerate(Prefetcher(make(), depth=2)):
        np.testing.assert_array_equal(
            b["feats"], expected[k],
            err_msg=f"prefetched batch {k} corrupted")


def test_io_layer_reads_bag_files(tmp_path, native_lib):
    """data.io load_features/load_coords/bag_length/list_bags handle .bag,
    dedup against sibling .h5 of the same slide."""
    from madeleine_tpu.data import io as bag_io

    rng = np.random.default_rng(6)
    feats = rng.standard_normal((25, 8)).astype(np.float32)
    coords = rng.integers(0, 50, (25, 2)).astype(np.int64)
    bagio.write_bag_file(str(tmp_path / "s0.bag"), feats, coords)
    bag_io.write_bag(str(tmp_path / "s0.h5"), feats + 1.0)  # stale duplicate
    bag_io.write_bag(str(tmp_path / "s1.h5"), feats)

    listed = list(bag_io.list_bags(str(tmp_path)))
    assert listed == ["s0.bag", "s1.h5"]  # .bag wins the dedup
    np.testing.assert_array_equal(
        bag_io.load_features(str(tmp_path / "s0.bag")), feats)
    np.testing.assert_array_equal(
        bag_io.load_coords(str(tmp_path / "s0.bag")), coords)
    assert bag_io.bag_length(str(tmp_path / "s0.bag")) == 25


def test_native_ragged_loader(tmp_path, native_lib):
    """NativeRaggedLoader: full bags padded to buckets with correct masks."""
    from madeleine_tpu.native.dataset import NativeRaggedLoader

    rng = np.random.default_rng(8)
    mods = ["HE", "X"]
    rows = []
    lengths = {}
    for i in range(5):
        sid = f"c{i}"
        labs = {"HE": 1, "X": int(i != 2)}
        for m, lab in labs.items():
            if lab:
                n = int(rng.integers(30, 120))
                lengths[(sid, m)] = n
                bagio.write_bag_file(str(tmp_path / f"{sid}_{m}.bag"),
                                     rng.standard_normal((n, 8)).astype(np.float32))
        rows.append({"slide_id": sid, **labs, "split": "train"})
    csv = str(tmp_path / "c.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    loader = NativeRaggedLoader(csv, str(tmp_path), mods, embedding_size=8,
                                batch_size=2, buckets=(64, 128), shuffle=False)
    batches = list(loader)
    assert len(batches) == 3
    seen = 0
    for b in batches:
        bs, n_mod, t, d = b["feats"].shape
        assert t in (64, 128)
        assert b["token_mask"].shape == (bs, n_mod, t)
        # masked region is zero
        assert np.all(b["feats"][~b["token_mask"]] == 0)
        for j, sid in enumerate(b["slide_ids"]):
            seen += 1
            for m_idx, m in enumerate(mods):
                n = lengths.get((sid, m), 0)
                assert b["token_mask"][j, m_idx].sum() == min(n, t)
    assert seen == 5
    loader.close()


def test_assemble_batch_bf16_output(tmp_path):
    """bf16 assembly: bf16-disk -> bf16 out is a pure memcpy; f32-disk rows
    round the same way as the writer. Missing readers zero-fill."""
    import numpy as np
    import pytest

    from madeleine_tpu.native import bagio

    bf16 = bagio.bf16_dtype()
    if bf16 is None:
        pytest.skip("ml_dtypes unavailable")
    rng = np.random.default_rng(0)
    d = 8
    f_bf = rng.standard_normal((20, d)).astype(np.float32)
    f_f32 = rng.standard_normal((12, d)).astype(np.float32)
    p1 = str(tmp_path / "a.bag")
    p2 = str(tmp_path / "b.bag")
    bagio.write_bag_file(p1, f_bf, dtype="bfloat16")
    bagio.write_bag_file(p2, f_f32, dtype="float32")
    r1, r2 = bagio.BagReader(p1), bagio.BagReader(p2)

    idx = np.stack([np.arange(5), np.arange(5) + 2, np.zeros(5, np.int64)])
    out = bagio.assemble_batch([r1, r2, None], idx.astype(np.int64), d,
                               dtype="bfloat16")
    assert out.dtype == bf16
    # bf16 disk -> bf16 out: bit-exact vs the numpy reader
    want1 = bagio._read_bag_numpy(p1)[0][:5]
    np.testing.assert_array_equal(np.asarray(out[0], np.float32), want1)
    # f32 disk -> bf16 out: same truncation rounding as the writer
    u32 = f_f32[2:7].view(np.uint32)
    want2 = (((u32 + 0x8000) >> 16).astype(np.uint16).astype(np.uint32)
             << 16).view(np.float32)
    np.testing.assert_array_equal(np.asarray(out[1], np.float32), want2)
    np.testing.assert_array_equal(np.asarray(out[2], np.float32), 0.0)
    r1.close(); r2.close()


def test_batch_indices_vectorized_wor(tmp_path, native_lib):
    """The vectorized subsample draw is without-replacement over valid rows
    (a permutation subset) for long bags and with-replacement for short
    ones — same distribution contract as SlideDataset.sample_n
    (ref: wsi_dataset.py:42-50)."""
    from madeleine_tpu.native.dataset import NativeTrainLoader

    rng = np.random.default_rng(3)
    mods = ["HE", "X"]
    rows = []
    sizes = {"c0": (40, 33), "c1": (16, 200), "c2": (32, None)}
    for sid, (n_he, n_x) in sizes.items():
        rows.append({"slide_id": sid, "HE": 1, "X": int(n_x is not None),
                     "split": "train"})
        for m, n in (("HE", n_he), ("X", n_x)):
            if n is not None:
                bagio.write_bag_file(
                    str(tmp_path / f"{sid}_{m}.bag"),
                    rng.standard_normal((n, 4)).astype(np.float32))
    csv = str(tmp_path / "c.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)

    t = 32
    ld = NativeTrainLoader(csv, str(tmp_path), mods, 4, t, batch_size=3,
                           shuffle=False, seed=0)
    idx = ld._batch_indices(np.arange(3))
    n_rows = [40, 33, 16, 200, 32, 0]
    assert idx.shape == (6, t)
    for j, n in enumerate(n_rows):
        if n == 0:
            np.testing.assert_array_equal(idx[j], 0)  # missing stain
        elif n >= t:
            assert idx[j].min() >= 0 and idx[j].max() < n
            assert len(np.unique(idx[j])) == t  # without replacement
        else:
            assert idx[j].min() >= 0 and idx[j].max() < n  # with replacement
        # sorted-emission contract: the C++ gather merges consecutive-row
        # runs into streaming copies (bagio.cpp gather_rows_stream)
        assert (np.diff(idx[j]) >= 0).all()
    # exactly-t bags draw a permutation of [0, t)
    np.testing.assert_array_equal(np.sort(idx[4]), np.arange(t))
    # deterministic under the loader's seeded rng
    ld2 = NativeTrainLoader(csv, str(tmp_path), mods, 4, t, batch_size=3,
                            shuffle=False, seed=0)
    np.testing.assert_array_equal(idx, ld2._batch_indices(np.arange(3)))
    ld.close(); ld2.close()


def test_batch_indices_numpy_fallback_wor(tmp_path, native_lib, monkeypatch):
    """The vectorized numpy fallback (no native lib) keeps the same WOR /
    with-replacement contract as the native sampler."""
    from madeleine_tpu.native import dataset as nd
    from madeleine_tpu.native.dataset import NativeTrainLoader

    rng = np.random.default_rng(4)
    for sid, n in (("c0", 48), ("c1", 9)):
        bagio.write_bag_file(str(tmp_path / f"{sid}_HE.bag"),
                             rng.standard_normal((n, 4)).astype(np.float32))
    csv = str(tmp_path / "c.csv")
    pd.DataFrame([{"slide_id": "c0", "HE": 1, "split": "train"},
                  {"slide_id": "c1", "HE": 1, "split": "train"}]
                 ).to_csv(csv, index=False)
    ld = NativeTrainLoader(csv, str(tmp_path), ["HE"], 4, 16, batch_size=2,
                           shuffle=False, seed=1)
    monkeypatch.setattr(
        "madeleine_tpu.native.bagio.sample_indices", lambda *a: None)
    idx = ld._batch_indices(np.arange(2))
    assert idx.shape == (2, 16)
    assert len(np.unique(idx[0])) == 16 and idx[0].max() < 48  # WOR
    assert idx[1].max() < 9 and idx[1].min() >= 0  # with replacement
    # fallback honors the same sorted-emission contract as the native sampler
    assert (np.diff(idx, axis=1) >= 0).all()
    ld.close()


def test_native_sampler_uniform_wor(native_lib):
    """The selection-sampling WOR draw (bagio.cpp bag_sample_indices,
    Knuth Algorithm S) must select every row with probability t/n and emit
    ascending indices. 4000 seeds x (n=50, t=20): per-row frequency within
    5 sigma of 0.4, output strictly increasing."""
    from madeleine_tpu.native.bagio import sample_indices

    n, t, reps = 50, 20, 4000
    counts = np.zeros(n, np.int64)
    for seed in range(reps):
        idx = sample_indices(seed, np.array([n], np.int64), t)
        assert idx is not None
        row = idx[0]
        assert (np.diff(row) > 0).all()  # strictly ascending = WOR + sorted
        counts[row] += 1
    p = t / n
    sigma = np.sqrt(reps * p * (1 - p))
    assert np.abs(counts - reps * p).max() < 5 * sigma, counts


def test_native_sampler_uniform_with_replacement(native_lib):
    """Short bags (n < t) draw with replacement; each draw uniform over n
    rows, emitted sorted (counting sort)."""
    from madeleine_tpu.native.bagio import sample_indices

    n, t, reps = 7, 24, 2000
    counts = np.zeros(n, np.int64)
    for seed in range(reps):
        idx = sample_indices(seed, np.array([n], np.int64), t)
        row = idx[0]
        assert (np.diff(row) >= 0).all()
        assert row.min() >= 0 and row.max() < n
        np.add.at(counts, row, 1)
    total = reps * t
    p = 1.0 / n
    sigma = np.sqrt(total * p * (1 - p))
    assert np.abs(counts - total * p).max() < 5 * sigma, counts
