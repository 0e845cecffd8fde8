"""Attention heatmaps — visualize per-patch attention over the slide.

Consumer of the model's return_attention branch (ref: Model.py:206-216, which
returns raw logits but has no visualization downstream). Maps per-head raw
attention logits back onto slide coordinates and renders per-head (and
head-mean) heatmap overlays.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def attention_to_grid(
    coords: np.ndarray,           # [n, 2] level-0 (x, y) patch origins
    attention: np.ndarray,        # [n] or [n, n_heads] raw logits or weights
    patch_size: int,
    softmax: bool = True,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Scatter attention onto the patch grid -> [rows, cols(, heads)] array
    (NaN where no patch)."""
    coords = np.asarray(coords)
    attention = np.asarray(attention, np.float32)
    if attention.ndim == 1:
        attention = attention[:, None]
    if softmax:
        a = attention - attention.max(axis=0, keepdims=True)
        e = np.exp(a)
        attention = e / e.sum(axis=0, keepdims=True)
    cs = coords // patch_size
    c0 = cs.min(axis=0)
    cs = cs - c0
    rows, cols = int(cs[:, 1].max()) + 1, int(cs[:, 0].max()) + 1
    grid = np.full((rows, cols, attention.shape[1]), np.nan, np.float32)
    grid[cs[:, 1], cs[:, 0]] = attention
    return grid, (int(c0[0] * patch_size), int(c0[1] * patch_size))


def save_heatmap(
    out_path: str,
    coords: np.ndarray,
    attention: np.ndarray,
    patch_size: int,
    thumbnail: Optional[np.ndarray] = None,  # RGB slide thumbnail to overlay
    head: Optional[int] = None,              # None = mean over heads
    alpha: float = 0.55,
    cell_px: int = 8,
) -> str:
    """Render a heatmap PNG (pure numpy + PIL; viridis-like colormap)."""
    from PIL import Image

    grid, _ = attention_to_grid(coords, attention, patch_size)
    with np.errstate(invalid="ignore"):  # empty cells are all-NaN by design
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            g = np.nanmean(grid, axis=-1) if head is None else grid[..., head]
    valid = ~np.isnan(g)
    lo = np.nanmin(g) if valid.any() else 0.0
    hi = np.nanmax(g) if valid.any() else 1.0
    norm = np.zeros_like(g)
    norm[valid] = (g[valid] - lo) / max(hi - lo, 1e-12)

    # compact 5-stop viridis-ish ramp
    stops = np.array([[68, 1, 84], [59, 82, 139], [33, 145, 140],
                      [94, 201, 98], [253, 231, 37]], np.float32)
    idx = norm * (len(stops) - 1)
    i0 = np.clip(idx.astype(int), 0, len(stops) - 2)
    frac = (idx - i0)[..., None]
    rgb = (stops[i0] * (1 - frac) + stops[i0 + 1] * frac).astype(np.uint8)
    rgb[~valid] = 255

    img = Image.fromarray(rgb).resize(
        (rgb.shape[1] * cell_px, rgb.shape[0] * cell_px), Image.NEAREST)
    if thumbnail is not None:
        base = Image.fromarray(np.asarray(thumbnail)).resize(img.size)
        mask_img = Image.fromarray(
            (np.repeat(np.repeat(valid, cell_px, 0), cell_px, 1) * int(alpha * 255)
             ).astype(np.uint8)).resize(img.size, Image.NEAREST)
        base.paste(img, (0, 0), mask_img)
        img = base
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    img.save(out_path)
    return out_path
