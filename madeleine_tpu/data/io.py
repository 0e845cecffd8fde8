"""HDF5 bag IO — file-format compatible with the reference.

Schema: one ``<slide_id>.h5`` per slide with datasets ``features`` [n, d] and
``coords`` [n, 2] (ref: preprocessing/conch_patch_embedder.py:127-131; readers
at datasets/wsi_dataset.py:14-19). Readers tolerate a leading singleton dim
(the reference squeezes, wsi_dataset.py:16).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

try:
    import h5py

    HAVE_H5PY = True
except ImportError:  # pragma: no cover - h5py is present in this image
    HAVE_H5PY = False


def load_features(path: str, dtype=np.float32) -> np.ndarray:
    """Read the ``features`` dataset -> [n, d] (ref: wsi_dataset.py:14-19).
    Accepts .h5 (reference schema), .npz, and native .bag files."""
    if path.endswith(".bag"):
        from madeleine_tpu.native.bagio import BagReader

        r = BagReader(path)
        try:
            feats = r.read_all()
        finally:
            r.close()
    elif path.endswith(".npz"):
        feats = np.load(path)["features"]
    else:
        if not HAVE_H5PY:
            raise RuntimeError("h5py unavailable; use .npz bags")
        with h5py.File(path, "r") as f:
            feats = f["features"][:]
    feats = np.asarray(feats)
    if feats.ndim == 3 and feats.shape[0] == 1:
        feats = feats[0]
    return feats.astype(dtype, copy=False)


def load_coords(path: str) -> Optional[np.ndarray]:
    if path.endswith(".bag"):
        from madeleine_tpu.native.bagio import BagReader, _read_bag_numpy

        r = BagReader(path)
        try:
            if not getattr(r, "_handle", None):
                return _read_bag_numpy(path)[1]
            import ctypes

            if not r._lib.bag_has_coords(r._handle):
                return None
            idx = np.arange(r.n_rows, dtype=np.int64)
            out = np.empty((r.n_rows, 2), np.int64)
            r._lib.bag_coords(
                r._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                r.n_rows,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
            return out
        finally:
            r.close()
    if path.endswith(".npz"):
        d = np.load(path)
        return d["coords"] if "coords" in d else None
    with h5py.File(path, "r") as f:
        if "coords" not in f:
            return None
        return f["coords"][:]


def write_bag(path: str, features: np.ndarray,
              coords: Optional[np.ndarray] = None,
              attrs: Optional[Dict] = None) -> None:
    """Write a bag file in the reference schema."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith(".npz"):
        data = {"features": features}
        if coords is not None:
            data["coords"] = coords
        np.savez(path, **data)
        return
    with h5py.File(path, "w") as f:
        f.create_dataset("features", data=features)
        if coords is not None:
            f.create_dataset("coords", data=coords)
        if attrs:
            for k, v in attrs.items():
                f.attrs[k] = v


def append_bag(path: str, features: np.ndarray,
               coords: Optional[np.ndarray] = None) -> None:
    """Incremental-append writer with resizable datasets — the streaming
    pattern the tile embedder uses (ref: conch_patch_embedder.py:16-66)."""
    first = not os.path.exists(path)
    with h5py.File(path, "a") as f:
        items = {"features": features}
        if coords is not None:
            items["coords"] = coords
        for name, arr in items.items():
            arr = np.asarray(arr)
            if first or name not in f:
                maxshape = (None,) + arr.shape[1:]
                f.create_dataset(name, data=arr, maxshape=maxshape,
                                 chunks=(max(1, min(len(arr), 1024)),) + arr.shape[1:])
            else:
                ds = f[name]
                n0 = ds.shape[0]
                ds.resize(n0 + arr.shape[0], axis=0)
                ds[n0:] = arr


def bag_length(path: str) -> int:
    """Token count without reading the payload (drives length bucketing)."""
    if path.endswith(".bag"):
        import struct

        with open(path, "rb") as f:
            head = f.read(16)
        return int(struct.unpack("<IIQ", head)[2])
    if path.endswith(".npz"):
        return int(np.load(path)["features"].shape[0])
    with h5py.File(path, "r") as f:
        shape = f["features"].shape
    return int(shape[0] if len(shape) != 3 else shape[1])


def list_bags(directory: str,
              exts: Tuple[str, ...] = (".h5", ".npz", ".bag")) -> Iterable[str]:
    """Bag files, deduplicated by slide id with priority .bag > .h5 > .npz
    (converted cohorts keep both formats side by side)."""
    priority = {".bag": 0, ".h5": 1, ".npz": 2}
    best: dict = {}
    for fn in os.listdir(directory):
        stem, ext = os.path.splitext(fn)
        if ext not in exts:
            continue
        if stem not in best or priority.get(ext, 9) < priority.get(
                os.path.splitext(best[stem])[1], 9):
            best[stem] = fn
    return sorted(best.values())
