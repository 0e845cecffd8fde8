"""Python bindings for the bagio native library (ctypes).

Builds ``libbagio.so`` from bagio.cpp on demand (g++ -O3, cached next to the
source; rebuilt when the source is newer). Every entry point has a pure-numpy
fallback, so environments without a toolchain still work — the native path is
a performance lever, not a dependency.

.bag format: see bagio.cpp header. `write_bag_file` / `convert_to_bag` produce
it from arrays / reference-schema h5 bags.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bagio.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libbagio.so")

MAGIC = 0x4741424D  # "MBAG"
DTYPE_F32, DTYPE_BF16 = 0, 2
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"* bagio native build failed ({msg[:200]}); using numpy fallback")
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None -> fallback mode."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if _build() is None:
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.bag_open.restype = ctypes.c_void_p
        lib.bag_open.argtypes = [ctypes.c_char_p]
        lib.bag_rows.restype = ctypes.c_int64
        lib.bag_rows.argtypes = [ctypes.c_void_p]
        lib.bag_cols.restype = ctypes.c_int64
        lib.bag_cols.argtypes = [ctypes.c_void_p]
        lib.bag_dtype.restype = ctypes.c_int32
        lib.bag_dtype.argtypes = [ctypes.c_void_p]
        lib.bag_has_coords.restype = ctypes.c_int32
        lib.bag_has_coords.argtypes = [ctypes.c_void_p]
        lib.bag_close.argtypes = [ctypes.c_void_p]
        lib.bag_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.bag_coords.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        lib.bag_assemble_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        lib.bag_assemble_batch_bf16.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_int32]
        lib.bag_read_all.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float)]
        lib.bag_sample_indices.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


# ---------------------------------------------------------------------------
# Writers / converters
# ---------------------------------------------------------------------------

def write_bag_file(path: str, features: np.ndarray,
                   coords: Optional[np.ndarray] = None,
                   dtype: str = "float32") -> None:
    """Write a .bag file. dtype: float32 | bfloat16 (bf16 halves disk/IO)."""
    features = np.ascontiguousarray(features)
    n, d = features.shape
    if dtype == "bfloat16":
        code = DTYPE_BF16
        # f32 -> bf16 via truncation of the high 16 bits (round-to-nearest-even
        # is overkill for storage of already-noisy features)
        as_u32 = features.astype(np.float32).view(np.uint32)
        payload = ((as_u32 + 0x8000) >> 16).astype(np.uint16).tobytes()
        itemsize = 2
    else:
        code = DTYPE_F32
        payload = features.astype(np.float32).tobytes()
        itemsize = 4
    coords_off = 0
    if coords is not None:
        coords_off = 40 + n * d * itemsize
    header = struct.pack("<IIQQIIQ", MAGIC, 1, n, d, code, 0, coords_off)
    assert len(header) == 40
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(header)
        f.write(payload)
        if coords is not None:
            f.write(np.ascontiguousarray(coords, np.int64).tobytes())


def convert_to_bag(src_path: str, dst_path: Optional[str] = None,
                   dtype: str = "float32") -> str:
    """Reference-schema h5/npz bag -> .bag."""
    from madeleine_tpu.data.io import load_coords, load_features

    dst_path = dst_path or os.path.splitext(src_path)[0] + ".bag"
    write_bag_file(dst_path, load_features(src_path), load_coords(src_path),
                   dtype=dtype)
    return dst_path


def _read_bag_numpy(path: str):
    """Pure-numpy .bag reader (fallback + tests)."""
    with open(path, "rb") as f:
        head = f.read(40)
        magic, version, n, d, code, _, coords_off = struct.unpack("<IIQQIIQ", head)
        if magic != MAGIC or version != 1:
            raise ValueError(f"not a bag file: {path}")
        if code == DTYPE_BF16:
            raw = np.frombuffer(f.read(n * d * 2), np.uint16).reshape(n, d)
            feats = (raw.astype(np.uint32) << 16).view(np.float32)
        else:
            feats = np.frombuffer(f.read(n * d * 4), np.float32).reshape(n, d)
        coords = None
        if coords_off:
            f.seek(coords_off)
            coords = np.frombuffer(f.read(n * 16), np.int64).reshape(n, 2)
    return feats, coords


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

class BagReader:
    """One open .bag (native mmap when available, numpy otherwise)."""

    def __init__(self, path: str):
        self.path = path
        lib = get_lib()
        self._lib = lib
        self._handle = None
        self._np = None
        if lib is not None:
            h = lib.bag_open(path.encode())
            if not h:
                raise IOError(f"cannot open bag: {path}")
            self._handle = ctypes.c_void_p(h)
            self.n_rows = int(lib.bag_rows(self._handle))
            self.n_cols = int(lib.bag_cols(self._handle))
        else:
            feats, coords = _read_bag_numpy(path)
            self._np = (feats, coords)
            self.n_rows, self.n_cols = feats.shape

    def gather(self, idx: np.ndarray) -> np.ndarray:
        idx = np.ascontiguousarray(idx, np.int64)
        out = np.empty((len(idx), self.n_cols), np.float32)
        if self._handle is not None:
            self._lib.bag_gather(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        else:
            safe = np.clip(idx, 0, self.n_rows - 1)
            out[:] = self._np[0][safe]
            out[(idx < 0) | (idx >= self.n_rows)] = 0.0
        return out

    def read_all(self) -> np.ndarray:
        if self._handle is not None:
            out = np.empty((self.n_rows, self.n_cols), np.float32)
            self._lib.bag_read_all(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            return out
        return np.array(self._np[0], np.float32)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.bag_close(self._handle)
            self._handle = None
        self._np = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:
            pass


def bf16_dtype():
    """numpy bfloat16 dtype (ml_dtypes) or None when unavailable."""
    try:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    except ImportError:
        return None


def assemble_batch(
    readers: Sequence[Optional[BagReader]],
    indices: np.ndarray,       # [n_tasks, t] int64 (rows per reader)
    d: int,
    n_threads: int = 8,
    out: Optional[np.ndarray] = None,
    dtype: str = "float32",
) -> np.ndarray:
    """Parallel gather: out[k] = readers[k].rows(indices[k]) (None -> zeros).
    Returns [n_tasks, t, d] in `dtype` (float32 | bfloat16). The C++ pool
    runs without the GIL. bf16-on-disk -> bf16 out is a pure memcpy — half
    the batch bytes, and the batch is born in the device-transfer dtype."""
    n_tasks, t = indices.shape
    lib = get_lib()
    native_ok = lib is not None and all(
        r is None or r._handle is not None for r in readers)
    if dtype == "bfloat16":
        bf16 = bf16_dtype()
        if bf16 is None:
            raise RuntimeError("bfloat16 assembly needs ml_dtypes")
        if out is None:
            out = np.empty((n_tasks, t, d), bf16)
            out.fill(0)  # single-thread first-touch (see float32 branch)
        if native_ok:
            handles = (ctypes.c_void_p * n_tasks)(
                *[r._handle if r is not None else None for r in readers])
            idx = np.ascontiguousarray(indices, np.int64)
            lib.bag_assemble_batch_bf16(
                handles, n_tasks,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                t, d,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                n_threads)
        else:
            for k, r in enumerate(readers):
                if r is None:
                    out[k] = np.zeros((), bf16)
                else:
                    f32 = r.gather(indices[k]).view(np.uint32)
                    out[k] = ((f32 + 0x8000) >> 16).astype(
                        np.uint16).view(bf16)
        return out
    if out is None:
        out = np.empty((n_tasks, t, d), np.float32)
        # Single-thread first-touch. NumPy madvises large buffers THP; 8 pool
        # threads concurrently huge-faulting one FRESH VMA convoy on the mmap
        # locks (measured ~36 s of kernel folio_zero_user for a 0.65 GB
        # batch on a 1-vCPU host). One sequential fill warms the pages in
        # ~0.15 s; reused ring buffers never pay it again.
        out.fill(0)
    if native_ok:
        handles = (ctypes.c_void_p * n_tasks)(
            *[r._handle if r is not None else None for r in readers])
        idx = np.ascontiguousarray(indices, np.int64)
        lib.bag_assemble_batch(
            handles, n_tasks,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            t, d,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_threads)
    else:
        for k, r in enumerate(readers):
            out[k] = 0.0 if r is None else r.gather(indices[k])
    return out


def sample_indices(seed: int, n_rows: np.ndarray, t: int) -> Optional[np.ndarray]:
    """Native WOR/with-replacement subsample draw: [len(n_rows), t] int64.

    Per bag: n == 0 -> zeros, n >= t -> partial Fisher-Yates without
    replacement, n < t -> with replacement (ref: wsi_dataset.py:42-50).
    Returns None when the native library is unavailable (caller falls back
    to the numpy draw)."""
    lib = get_lib()
    if lib is None:
        return None
    n_rows = np.ascontiguousarray(n_rows, np.int64)
    out = np.empty((len(n_rows), t), np.int64)
    lib.bag_sample_indices(
        ctypes.c_uint64(seed & (2**64 - 1)),
        n_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(n_rows), t,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
