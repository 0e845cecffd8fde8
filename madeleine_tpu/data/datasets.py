"""Datasets and loaders — numpy-native, no torch DataLoader.

Re-implements the reference's data layer (ref: madeleine/datasets/wsi_dataset.py)
with TPU-shaped output:

- `SlideDataset`: one item = one *case* — per-modality bags loaded from
  ``{slide_id}_{modality}{split_suffix}.h5``, missing stains replaced by a
  zero placeholder and masked via modality labels (ref: wsi_dataset.py:52-84);
  train-time subsample to a fixed token count with replacement when short
  (ref: wsi_dataset.py:42-50) so batches stack to static shapes.
- `SimpleDataset`: directory-of-bags -> (features, slide_id) for downstream
  encoding (ref: wsi_dataset.py:102-125).
- `BucketedBagLoader`: NEW — groups variable-length bags into padded,
  mask-carrying, length-bucketed batches so inference runs many slides per
  device step with a handful of compiled shapes, instead of the reference's
  batch_size=1 loop (ref: setup_components.py:162-168). This is the feeding
  path for the >=200 slides/sec/chip target.
- `Prefetcher`: background-thread double buffering for host-side IO overlap
  (the reference hardcodes num_workers=0, setup_components.py:149).
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from madeleine_tpu.data.io import bag_length, list_bags, load_features

# ---------------------------------------------------------------------------
# Train dataset
# ---------------------------------------------------------------------------


class SlideDataset:
    """Multistain case dataset (ref: wsi_dataset.py:21-84)."""

    def __init__(
        self,
        dataset_name: str,
        csv_path: str,
        features_path: str,
        modalities: Sequence[str],
        embedding_size: Optional[int] = None,
        sample: int = -1,
        train: bool = True,
        rng: Optional[np.random.Generator] = None,
    ):
        import pandas as pd

        self.dataset_name = dataset_name
        self.dataframe = pd.read_csv(csv_path)
        self.features_path = features_path
        self.modalities = list(modalities)
        self.sample = sample
        self.train = train
        self.embedding_size = embedding_size
        self.rng = rng or np.random.default_rng(0)

    def __len__(self) -> int:
        return len(self.dataframe)

    def sample_n(self, feats: np.ndarray) -> np.ndarray:
        """Fixed-size token subsample; with replacement when the bag is short
        (ref: wsi_dataset.py:42-50)."""
        if self.sample > -1:
            n = feats.shape[0]
            if n < self.sample:
                idx = self.rng.integers(0, n, size=self.sample)
            else:
                idx = self.rng.permutation(n)[: self.sample]
            feats = feats[idx]
        return feats

    def __getitem__(self, index: int) -> Dict:
        row = self.dataframe.iloc[index]
        slide_id = row["slide_id"]
        modality_labels = [int(row[m]) for m in self.modalities]

        if self.train:
            split_type = row["split"]
            special_id = "" if split_type == "train" else f"_{split_type}"
            all_feats = []
            for modality, label in zip(self.modalities, modality_labels):
                if label == 1:
                    path = os.path.join(
                        self.features_path, f"{slide_id}_{modality}{special_id}.h5")
                    if not os.path.exists(path) and os.path.exists(path[:-3] + ".npz"):
                        path = path[:-3] + ".npz"
                    feats = load_features(path)
                else:
                    # zero placeholder, masked out by modality label downstream
                    # (ref: wsi_dataset.py:66)
                    feats = np.zeros((2, self.embedding_size), np.float32)
                all_feats.append(self.sample_n(feats))
        else:
            path = os.path.join(self.features_path, f"{slide_id}.h5")
            all_feats = [load_features(path)]
            modality_labels = [1]

        return {"feats": all_feats, "modality_labels": modality_labels,
                "slide_id": slide_id}


def collate(batch: List[Dict]) -> Dict:
    """Stack cases into [bs, n_mod, t, d] (+ labels [bs, n_mod])
    (ref: wsi_dataset.py:86-99). Requires fixed-length bags (train subsample)."""
    feats = np.stack([np.stack(item["feats"]) for item in batch])
    labels = np.stack([np.asarray(item["modality_labels"], np.float32)
                       for item in batch])
    return {
        "feats": feats.astype(np.float32),
        "modality_labels": labels,
        "slide_ids": [item["slide_id"] for item in batch],
    }


class TrainLoader:
    """Shuffling epoch iterator over SlideDataset with drop-less batching.

    The final short batch is padded up to batch_size by repeating samples with a
    zeroed modality mask (invalid rows contribute nothing to masked losses) so
    every step has one static shape — no recompilation, no dropped data."""

    def __init__(self, dataset: SlideDataset, batch_size: int,
                 shuffle: bool = True, rng: Optional[np.random.Generator] = None,
                 pad_final: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = rng or np.random.default_rng(seed)
        self.pad_final = pad_final
        self.seed = seed

    def set_epoch(self, epoch: int) -> None:
        """Derive the epoch's RNG from (seed, epoch) so a resumed run replays
        the exact shuffle/subsample stream (the reference has no resume at
        all, SURVEY §5). Also reseeds the dataset's subsample rng."""
        self.rng = np.random.default_rng((self.seed, epoch))
        if hasattr(self.dataset, "rng"):
            self.dataset.rng = np.random.default_rng((self.seed, epoch, 1))

    def __len__(self) -> int:
        n = len(self.dataset)
        bs = self.batch_size
        return (n + bs - 1) // bs if self.pad_final else n // bs

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            if len(idx) < bs:
                if not self.pad_final:
                    break
                pad = idx[np.zeros(bs - len(idx), np.int64)]
                batch = [self.dataset[i] for i in idx] + [
                    self.dataset[i] for i in pad]
                out = collate(batch)
                out["modality_labels"][len(idx):] = 0.0  # mask padded rows
                out["sample_mask"] = np.concatenate(
                    [np.ones(len(idx), bool), np.zeros(bs - len(idx), bool)])
            else:
                out = collate([self.dataset[i] for i in idx])
                out["sample_mask"] = np.ones(bs, bool)
            yield out


class RaggedTrainLoader:
    """Full-bag multistain training batches: no token subsampling.

    The reference cannot train on full bags at all (it must subsample to a
    fixed 2048, ref: wsi_dataset.py:42-50). Here each batch pads every
    (case, stain) bag to the batch's length bucket and carries a
    [bs, n_mod, t] token mask; the train step's masked pooling + token-masked
    GOT consume it. Buckets quantize the padded length so XLA compiles a
    handful of shapes."""

    def __init__(self, dataset: SlideDataset, batch_size: int,
                 buckets: Sequence[int] = (1024, 2048, 4096, 8192, 16384),
                 shuffle: bool = True, seed: int = 0,
                 max_tokens: Optional[int] = None):
        if dataset.sample != -1:
            raise ValueError("RaggedTrainLoader expects sample=-1 datasets")
        self.dataset = dataset
        self.batch_size = batch_size
        self.buckets = sorted(buckets)
        self.shuffle = shuffle
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.max_tokens = max_tokens or self.buckets[-1]

    def set_epoch(self, epoch: int) -> None:
        self.rng = np.random.default_rng((self.seed, epoch))

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _bucket_of(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            items = [self.dataset[i] for i in idx]
            n_valid = len(items)
            while len(items) < bs:            # final-batch padding
                items.append(items[0])
            longest = max(f.shape[0] for it in items for f in it["feats"])
            t = self._bucket_of(min(longest, self.max_tokens))
            n_mod = len(items[0]["feats"])
            d = items[0]["feats"][0].shape[1]
            feats = np.zeros((bs, n_mod, t, d), np.float32)
            token_mask = np.zeros((bs, n_mod, t), bool)
            labels = np.zeros((bs, n_mod), np.float32)
            for b, item in enumerate(items):
                for m, f in enumerate(item["feats"]):
                    n = min(f.shape[0], t)
                    feats[b, m, :n] = f[:n]
                    token_mask[b, m, :n] = True
                labels[b] = np.asarray(item["modality_labels"], np.float32)
            sample_mask = np.ones(bs, bool)
            if n_valid < bs:
                labels[n_valid:] = 0.0
                sample_mask[n_valid:] = False
            yield {
                "feats": feats,
                "modality_labels": labels,
                "token_mask": token_mask,
                "sample_mask": sample_mask,
                "slide_ids": [it["slide_id"] for it in items[:n_valid]],
            }


# ---------------------------------------------------------------------------
# Inference datasets
# ---------------------------------------------------------------------------


class SimpleDataset:
    """Directory of bag files -> (features, slide_id) (ref: wsi_dataset.py:102-119)."""

    def __init__(self, features_path: str):
        self.features_path = features_path
        self.fnames = list(list_bags(features_path))

    def __len__(self) -> int:
        return len(self.fnames)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, str]:
        fn = self.fnames[index]
        feats = load_features(os.path.join(self.features_path, fn))
        return feats, os.path.splitext(fn)[0]


DEFAULT_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


class BucketedBagLoader:
    """Pad variable-length bags into length-bucketed batches.

    Slides are grouped by ceil-to-bucket length and emitted as
    ``{"feats": [b, T_bucket, d], "mask": [b, T_bucket], "slide_ids": [...]}``.
    Token budget per batch caps padding waste and device memory; each distinct
    (T_bucket, b) pair costs one XLA compile, so batch sizes are quantized to
    powers of two."""

    def __init__(
        self,
        features_path: str,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        tokens_per_batch: int = 262144,
        max_batch: int = 64,
        dtype=np.float32,
    ):
        self.features_path = features_path
        self.buckets = sorted(buckets)
        self.tokens_per_batch = tokens_per_batch
        self.max_batch = max_batch
        self.dtype = dtype
        self.fnames = list(list_bags(features_path))

    def __len__(self) -> int:
        return len(self.fnames)

    def _bucket_of(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]  # longer bags are truncated to the top bucket

    @staticmethod
    def _pow2_floor(x: int) -> int:
        return 1 << (max(x, 1).bit_length() - 1)

    def __iter__(self) -> Iterator[Dict]:
        # Plan: length-scan (cheap header reads), group by bucket.
        groups: Dict[int, List[str]] = {}
        for fn in self.fnames:
            n = bag_length(os.path.join(self.features_path, fn))
            groups.setdefault(self._bucket_of(n), []).append(fn)

        for bucket in sorted(groups):
            fns = groups[bucket]
            bs = max(1, min(self.max_batch, self.tokens_per_batch // bucket))
            bs = self._pow2_floor(bs)
            for start in range(0, len(fns), bs):
                chunk = fns[start:start + bs]
                d = None
                feats_list, masks, ids = [], [], []
                for fn in chunk:
                    f = load_features(os.path.join(self.features_path, fn),
                                      self.dtype)
                    if f.shape[0] > bucket:
                        f = f[:bucket]
                    d = f.shape[1]
                    pad = bucket - f.shape[0]
                    mask = np.zeros(bucket, bool)
                    mask[: f.shape[0]] = True
                    if pad:
                        f = np.pad(f, ((0, pad), (0, 0)))
                    feats_list.append(f)
                    masks.append(mask)
                    ids.append(os.path.splitext(fn)[0])
                # pad the batch dim to the planned (power-of-two) size so the
                # tail batch reuses the same compiled shape
                while len(feats_list) < bs:
                    feats_list.append(np.zeros((bucket, d), self.dtype))
                    masks.append(np.zeros(bucket, bool))
                yield {
                    "feats": np.stack(feats_list),
                    "mask": np.stack(masks),
                    "slide_ids": ids,
                    "n_valid": len(ids),
                }


class Prefetcher:
    """Background-thread prefetch wrapper around any batch iterable —
    overlaps host HDF5 reads with device compute."""

    def __init__(self, iterable, depth: int = 2):
        self.iterable = iterable
        self.depth = depth

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        sentinel = object()
        err: List[BaseException] = []

        def worker():
            try:
                for item in self.iterable:
                    q.put(item)
            except BaseException as e:  # propagate into the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
