"""Tile embedding — batched patch-encoder over WSI tiles
(ref: preprocessing/conch_patch_embedder.py).

The reference hardcodes the CONCH ViT-B/16 checkpoint (gated HF weights,
conch_patch_embedder.py:93-95). Here the encoder is pluggable:

- `TileEncoder` protocol: callable ``uint8 tiles [n, s, s, 3] -> features [n, d]``.
- `JaxPatchEncoder`: any jitted JAX fn + params, batched on the TPU.
- `make_conch_encoder()`: loads CONCH through the `conch` package when installed
  (it is not in this image) — surface parity with ref conch_patch_embedder.py:75-95.
- `HandcraftedEncoder`: dependency-free fallback (downsampled RGB + color
  statistics), useful for pipeline tests and smoke runs.

Output schema matches the reference exactly: per-slide ``.h5`` with resizable
``features`` [n, d] float32 and ``coords`` [n, 2] int (level-0 x, y), written
incrementally (ref: save_hdf5, conch_patch_embedder.py:16-66).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from madeleine_tpu.data.io import append_bag
from madeleine_tpu.preprocessing.patching import WSIPatcher, mag_to_px_size
from madeleine_tpu.preprocessing.wsi import wsi_factory

TileEncoder = Callable[[np.ndarray], np.ndarray]


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

class HandcraftedEncoder:
    """Deterministic classical descriptor (no weights): 8x8x3 mean-pooled RGB +
    per-channel moments, L2-normalized, projected to `dim` with a fixed random
    projection. For pipeline tests and environments without CONCH."""

    def __init__(self, dim: int = 512, seed: int = 0):
        self.dim = dim
        self._proj: Optional[np.ndarray] = None
        self._seed = seed

    def __call__(self, tiles: np.ndarray) -> np.ndarray:
        import cv2

        n = tiles.shape[0]
        pooled = np.stack([
            cv2.resize(t, (8, 8), interpolation=cv2.INTER_AREA) for t in tiles
        ]).reshape(n, -1).astype(np.float32) / 255.0
        flat = tiles.reshape(n, -1, 3).astype(np.float32) / 255.0
        moments = np.concatenate([flat.mean(1), flat.std(1)], axis=1)
        desc = np.concatenate([pooled, moments], axis=1)
        if self._proj is None or self._proj.shape[0] != desc.shape[1]:
            rng = np.random.default_rng(self._seed)
            self._proj = rng.standard_normal(
                (desc.shape[1], self.dim)).astype(np.float32) / np.sqrt(desc.shape[1])
        out = desc @ self._proj
        return out / (np.linalg.norm(out, axis=1, keepdims=True) + 1e-8)


class JaxPatchEncoder:
    """Wrap a jitted JAX apply fn: tiles are normalized to [0,1] f32 (or via a
    custom preprocess) and encoded on-device in one call per batch."""

    def __init__(self, apply_fn, params, preprocess=None, dtype=None):
        import jax

        self.apply_fn = jax.jit(apply_fn)
        self.params = params
        self.preprocess = preprocess
        self.dtype = dtype

    def __call__(self, tiles: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        x = tiles.astype(np.float32) / 255.0
        if self.preprocess is not None:
            x = self.preprocess(x)
        x = jnp.asarray(x, self.dtype) if self.dtype else jnp.asarray(x)
        return np.asarray(self.apply_fn(self.params, x), np.float32)


def make_conch_encoder(checkpoint: str = "conch_ViT-B-16",
                       hf_repo: str = "hf_hub:MahmoodLab/conch",
                       img_size: int = 224) -> TileEncoder:
    """CONCH patch encoder (ref: conch_patch_embedder.py:75-95,122-125):
    ``encode_image(proj_contrast=False, normalize=False)`` -> 512-d. Requires
    the external `conch` package + gated HF weights."""
    try:
        import torch
        from conch.open_clip_custom import create_model_from_pretrained
    except ImportError as e:
        raise ImportError(
            "CONCH unavailable: install the `conch` package and request access "
            "to MahmoodLab/conch weights, or pass a custom encoder.") from e

    model, preprocess = create_model_from_pretrained(
        checkpoint, hf_repo, force_image_size=img_size)
    model.eval()

    def encode(tiles: np.ndarray) -> np.ndarray:
        from PIL import Image

        with torch.inference_mode():
            batch = torch.stack([preprocess(Image.fromarray(t)) for t in tiles])
            feats = model.encode_image(batch, proj_contrast=False,
                                       normalize=False)
        return feats.float().cpu().numpy()

    return encode


# ---------------------------------------------------------------------------
# Embedder
# ---------------------------------------------------------------------------

class TileEmbedder:
    """Patch a slide and stream tile features to h5
    (surface parity: ref TileEmbedder.embed_tiles, conch_patch_embedder.py:97-134)."""

    def __init__(
        self,
        encoder: Optional[TileEncoder] = None,
        target_patch_size: int = 256,
        target_mag: float = 10.0,
        batch_size: int = 64,
        save_path: str = ".",
    ):
        self.encoder = encoder or HandcraftedEncoder()
        self.target_patch_size = target_patch_size
        self.target_mag = target_mag
        self.batch_size = batch_size
        self.save_path = save_path

    def embed_tiles(self, wsi, mask: Optional[np.ndarray], fn: str,
                    pixel_size: Optional[float] = None) -> str:
        """Segmented slide -> ``<save_path>/patch_embeddings/<fn>.h5``."""
        wsi = wsi_factory(wsi, pixel_size)
        px = pixel_size or getattr(wsi, "pixel_size", None)
        if px is None:
            raise ValueError("pixel_size required")
        patcher = WSIPatcher(
            wsi, self.target_patch_size, px,
            dst_pixel_size=mag_to_px_size(self.target_mag), mask=mask)

        out_dir = os.path.join(self.save_path, "patch_embeddings")
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"{fn}.h5")
        if os.path.exists(out_path):
            os.remove(out_path)

        tiles, coords = [], []
        for tile, x, y in patcher:
            tiles.append(tile)
            coords.append((x, y))
            if len(tiles) >= self.batch_size:
                self._flush(out_path, tiles, coords)
        self._flush(out_path, tiles, coords)
        if not os.path.exists(out_path):
            # slide with no tissue tiles: write an empty-but-valid bag
            append_bag(out_path,
                       np.zeros((0, getattr(self.encoder, "dim", 512)),
                                np.float32),
                       np.zeros((0, 2), np.int64))
        return out_path

    def _flush(self, out_path: str, tiles: list, coords: list) -> None:
        if not tiles:
            return
        feats = np.asarray(self.encoder(np.stack(tiles)), np.float32)
        append_bag(out_path, feats, np.asarray(coords, np.int64))
        tiles.clear()
        coords.clear()
