"""Native-backed training data path.

`NativeTrainLoader` is the drop-in fast replacement for
datasets.SlideDataset + TrainLoader over `.bag` files: per batch it builds the
subsample index matrix in numpy (same RNG semantics as SlideDataset.sample_n,
ref: wsi_dataset.py:42-50) and hands the whole [bs*n_mod] gather to the C++
thread pool — zero GIL, one preallocated output buffer, missing stains
zero-filled in native code (ref placeholder semantics: wsi_dataset.py:66).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from madeleine_tpu.native.bagio import BagReader, assemble_batch


class NativeTrainLoader:
    def __init__(
        self,
        csv_path: str,
        bag_dir: str,
        modalities: Sequence[str],
        embedding_size: int,
        sample: int,
        batch_size: int,
        shuffle: bool = True,
        rng: Optional[np.random.Generator] = None,
        n_threads: int = 8,
        pad_final: bool = True,
        seed: int = 0,
        buffer_depth: int = 4,
        per_case_seed: bool = False,
        process_index: int = 0,
        process_count: int = 1,
        out_dtype: str = "float32",
    ):
        import pandas as pd

        self.df = pd.read_csv(csv_path)
        self.bag_dir = bag_dir
        self.modalities = list(modalities)
        self.d = embedding_size
        self.sample = sample
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = rng or np.random.default_rng(seed)
        self.n_threads = n_threads
        self.pad_final = pad_final
        self.seed = seed
        self.epoch = 0
        # multi-host: per-case seeding makes subsampling a pure function of
        # (seed, epoch, case, stain) so any host loading any row block draws
        # identical tokens; batch_size is the GLOBAL size, each host
        # materializes its contiguous block (see parallel/multihost.py)
        if batch_size % process_count != 0:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"process_count {process_count}")
        if process_count > 1 and not per_case_seed and sample != -1:
            raise ValueError("multi-host subsampled loading requires "
                             "per_case_seed=True")
        self.per_case_seed = per_case_seed
        self.process_index = process_index
        self.process_count = process_count

        # Open every present (case, stain) bag once; handles are mmaps, cheap.
        self.readers: List[List[Optional[BagReader]]] = []
        self.labels = np.zeros((len(self.df), len(self.modalities)), np.float32)
        n_missing = 0
        for i, row in self.df.iterrows():
            sid = row["slide_id"]
            suffix = "" if row.get("split", "train") == "train" else f"_{row['split']}"
            case: List[Optional[BagReader]] = []
            for m_idx, m in enumerate(self.modalities):
                path = os.path.join(bag_dir, f"{sid}_{m}{suffix}.bag")
                if int(row.get(m, 0)) == 1:
                    if os.path.exists(path):
                        case.append(BagReader(path))
                        self.labels[i, m_idx] = 1.0
                    else:
                        # csv says present but no .bag: treat as missing stain
                        # (zero placeholder) rather than crashing, but say so
                        n_missing += 1
                        case.append(None)
                else:
                    case.append(None)
            self.readers.append(case)
        if n_missing:
            print(f"* warning: {n_missing} (case, stain) bags listed in the "
                  f"csv are missing from {bag_dir}; treated as absent stains")

        # Ring of output buffers: batch k is assembled into ring[k % depth],
        # so a consumer (e.g. a Prefetcher with depth <= buffer_depth - 2) can
        # hold earlier batches without the producer overwriting them. One
        # shared buffer silently corrupted prefetched batches.
        self._buf_depth = max(2, buffer_depth)
        # "bfloat16" halves the batch bytes (pure memcpy from bf16 disk) and
        # hands the train loop its transfer dtype directly — no host cast
        self.out_dtype = out_dtype
        if out_dtype == "bfloat16":
            from madeleine_tpu.native.bagio import bf16_dtype

            np_dtype = bf16_dtype()
            if np_dtype is None:
                raise RuntimeError("out_dtype=bfloat16 needs ml_dtypes")
        else:
            np_dtype = np.float32
        self._np_dtype = np_dtype
        local_bs = batch_size // process_count
        self._bufs = [
            np.empty((local_bs * len(self.modalities),
                      max(self.sample, 1), self.d), np_dtype)
            for _ in range(self._buf_depth)]
        for b in self._bufs:
            b.fill(0)  # single-thread first-touch (see bagio.assemble_batch)
        self._buf_i = 0

    def _next_buf(self) -> np.ndarray:
        buf = self._bufs[self._buf_i]
        self._buf_i = (self._buf_i + 1) % self._buf_depth
        return buf

    def __len__(self) -> int:
        n, bs = len(self.df), self.batch_size
        return (n + bs - 1) // bs if self.pad_final else n // bs

    def set_epoch(self, epoch: int) -> None:
        """(seed, epoch)-derived RNG for deterministic resume — see
        datasets.TrainLoader.set_epoch."""
        self.rng = np.random.default_rng((self.seed, epoch))
        self.epoch = epoch

    def _indices_for(self, reader: Optional[BagReader],
                     case_idx: int = -1, m_idx: int = -1) -> np.ndarray:
        t = self.sample
        if reader is None:
            return np.zeros(t, np.int64)
        rng = (np.random.default_rng((self.seed, self.epoch, case_idx, m_idx))
               if self.per_case_seed else self.rng)
        n = reader.n_rows
        if n < t:  # with replacement (ref: wsi_dataset.py:44-46)
            return rng.integers(0, n, size=t).astype(np.int64)
        return rng.permutation(n)[:t].astype(np.int64)

    def _batch_indices(self, sel_l: np.ndarray) -> np.ndarray:
        """Subsample index matrix [lbs * n_mod, t] for one batch.

        per_case_seed draws per (case, stain) so any host regenerates any
        row identically (multi-host contract). Otherwise the draws are
        vectorized: one batched uniform-key argpartition replaces ~325
        Generator.permutation calls (~100 ms/batch of numpy call overhead
        at canonical scale on a 1-vCPU host). A WOR sample is the t smallest
        iid keys over the valid rows — same distribution as permutation[:t],
        different stream consumption (determinism tests unaffected; the
        model is permutation-invariant over tokens).

        Rows come back SORTED per bag (both the native sampler and this
        fallback): a subsample is a (multi)set, and sorted indices make the
        C++ gather near-sequential — consecutive rows merge into single
        streaming copies (bagio.cpp gather_rows_stream)."""
        n_mod, t = len(self.modalities), self.sample
        if self.per_case_seed:
            return np.stack([
                self._indices_for(self.readers[i][m], int(i), m)
                for i in sel_l for m in range(n_mod)])
        n_rows = np.asarray([0 if r is None else r.n_rows
                             for i in sel_l for r in self.readers[i]],
                            np.int64)
        from madeleine_tpu.native.bagio import sample_indices

        native = sample_indices(int(self.rng.integers(0, 2**63)), n_rows, t)
        if native is not None:
            return native
        out = np.zeros((len(n_rows), t), np.int64)
        big = n_rows >= t
        if big.any():
            nb = n_rows[big]
            nmax = int(nb.max())
            keys = self.rng.random((len(nb), nmax))
            keys[np.arange(nmax)[None, :] >= nb[:, None]] = np.inf
            out[big] = np.sort(
                np.argpartition(keys, t - 1, axis=1)[:, :t], axis=1)
        for j in np.nonzero((~big) & (n_rows > 0))[0]:
            # short bags sample with replacement (ref: wsi_dataset.py:44-46)
            out[j] = np.sort(self.rng.integers(0, n_rows[j], size=t))
        return out

    def _local_slice(self) -> slice:
        lbs = self.batch_size // self.process_count
        return slice(self.process_index * lbs, (self.process_index + 1) * lbs)

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.df))
        if self.shuffle:
            self.rng.shuffle(order)
        bs, n_mod, t = self.batch_size, len(self.modalities), self.sample
        loc = self._local_slice()
        for start in range(0, len(order), bs):
            sel = order[start:start + bs]
            n_valid = len(sel)
            if n_valid < bs:
                if not self.pad_final:
                    break
                sel = np.concatenate([sel, np.repeat(sel[:1], bs - n_valid)])
            mask_g = np.arange(bs) < n_valid
            sel_l, mask_l = sel[loc], mask_g[loc]
            lbs = len(sel_l)
            readers = [self.readers[i][m] for i in sel_l for m in range(n_mod)]
            indices = self._batch_indices(sel_l)
            feats = assemble_batch(readers, indices, self.d,
                                   n_threads=self.n_threads,
                                   out=self._next_buf(),
                                   dtype=self.out_dtype)
            labels = self.labels[sel_l].copy()
            labels[~mask_l] = 0.0
            yield {
                "feats": feats.reshape(lbs, n_mod, t, self.d),
                "modality_labels": labels,
                "sample_mask": mask_l,
                "slide_ids": [str(self.df.iloc[i]["slide_id"]) for i in sel_l],
            }

    def close(self) -> None:
        for case in self.readers:
            for r in case:
                if r is not None:
                    r.close()


class NativeRaggedLoader(NativeTrainLoader):
    """Full-bag (ragged) batches from .bag files via the C++ assembler.

    The assembler zero-fills out-of-range rows, so padding a bag to its
    bucket is just gathering indices [0, bucket) — one threaded pass fills
    features AND padding; token masks come from the stored bag lengths."""

    def __init__(self, *args, buckets=(1024, 2048, 4096, 8192, 16384),
                 max_tokens: Optional[int] = None, **kw):
        kw.setdefault("sample", -1)
        super().__init__(*args, **kw)
        self.buckets = sorted(buckets)
        # None = unbounded: buckets grow past the top so bags train whole;
        # an explicit cap counts every capped bag (never silent)
        self.max_tokens = max_tokens
        self.truncation_count = 0
        # Flat reusable buffers carved per batch: buckets vary, so buffers
        # are 1-D and grown to the largest need; a contiguous slice reshapes
        # to any [n_tasks, t, d]. Reuse avoids the THP first-touch fault
        # convoy a fresh buffer costs per batch (bagio.assemble_batch note).
        self._flat_bufs: list = [None] * max(2, kw.get("buffer_depth", 4))
        self._flat_i = 0

    def _bucket_of(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        from madeleine_tpu.data.datasets import grow_bucket

        return grow_bucket(n, self.buckets[-1])

    def _cap(self, n: int) -> int:
        if self.max_tokens is not None and n > self.max_tokens:
            self.truncation_count += 1
            return self.max_tokens
        return n

    def _get_out(self, n_tasks: int, t: int) -> np.ndarray:
        """Reusable [n_tasks, t, d] view carved from a flat ring buffer."""
        need = n_tasks * t * self.d
        buf = self._flat_bufs[self._flat_i]
        if buf is None or buf.size < need:
            buf = np.empty(need, self._np_dtype)
            buf.fill(0)  # single-thread first-touch (bagio note)
            self._flat_bufs[self._flat_i] = buf
        self._flat_i = (self._flat_i + 1) % len(self._flat_bufs)
        return buf[:need].reshape(n_tasks, t, self.d)

    def __iter__(self) -> Iterator[Dict]:
        order = np.arange(len(self.df))
        if self.shuffle:
            self.rng.shuffle(order)
        bs, n_mod = self.batch_size, len(self.modalities)
        loc = self._local_slice()
        for start in range(0, len(order), bs):
            sel = order[start:start + bs]
            n_valid = len(sel)
            if n_valid < bs:
                if not self.pad_final:
                    break
                sel = np.concatenate([sel, np.repeat(sel[:1], bs - n_valid)])
            # bucket from GLOBAL batch lengths (mmap headers, no row IO) so
            # every host pads to the same shape
            glob_lengths = [0 if r is None else self._cap(r.n_rows)
                            for i in sel for r in self.readers[i]]
            t = self._bucket_of(max(glob_lengths) if glob_lengths else 1)
            mask_g = np.arange(bs) < n_valid
            sel_l, mask_l = sel[loc], mask_g[loc]
            lbs = len(sel_l)
            readers = [self.readers[i][m] for i in sel_l for m in range(n_mod)]
            cap_t = t if self.max_tokens is None else min(self.max_tokens, t)
            lengths = np.asarray(
                [0 if r is None else min(r.n_rows, cap_t)
                 for r in readers], np.int64)
            idx = np.broadcast_to(np.arange(t, dtype=np.int64),
                                  (len(readers), t))
            feats = assemble_batch(readers, np.ascontiguousarray(idx), self.d,
                                   n_threads=self.n_threads,
                                   dtype=self.out_dtype,
                                   out=self._get_out(len(readers), t))
            token_mask = (np.arange(t)[None, :]
                          < lengths[:, None]).reshape(lbs, n_mod, t)
            labels = self.labels[sel_l].copy()
            labels[~mask_l] = 0.0
            yield {
                "feats": feats.reshape(lbs, n_mod, t, self.d),
                "modality_labels": labels,
                "token_mask": token_mask,
                "sample_mask": mask_l,
                "slide_ids": [str(self.df.iloc[i]["slide_id"])
                              for i, v in zip(sel_l, mask_l) if v],
            }
