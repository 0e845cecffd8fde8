"""Render per-slide attention heatmaps from a MADELEINE checkpoint.

Usage:
    python extract_attention_maps.py --local_dir <dir with patch_embeddings/> \
        --model_dir ./../models [--head N] [--out_dir heatmaps]

For each bag file (which must carry ``coords``), computes the raw per-head
attention logits (ref return_attention branch: Model.py:206-216) and writes a
softmax heatmap PNG per slide. No reference CLI equivalent — the reference
returns attention but ships no consumer for it.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--local_dir", type=str, required=True)
    parser.add_argument("--model_dir", type=str, default="./../models")
    parser.add_argument("--out_dir", type=str, default=None)
    parser.add_argument("--head", type=int, default=None,
                        help="head index (default: mean over heads)")
    parser.add_argument("--patch_size", type=int, default=256,
                        help="patch pitch in level-0 px (for grid layout)")
    parser.add_argument("--no_download", action="store_true")
    args = parser.parse_args()

    import jax.numpy as jnp

    from madeleine_tpu.data.io import list_bags, load_coords, load_features
    from madeleine_tpu.eval.heatmap import save_heatmap
    from madeleine_tpu.models.factory import create_model_from_pretrained
    from madeleine_tpu.models.madeleine import encode_with_attention

    cfg, params, _ = create_model_from_pretrained(
        os.path.join(args.model_dir, "MADELEINE"),
        download=not args.no_download)

    feat_dir = os.path.join(args.local_dir, "patch_embeddings")
    if not os.path.isdir(feat_dir):
        feat_dir = args.local_dir
    out_dir = args.out_dir or os.path.join(args.local_dir, "attention_maps")
    os.makedirs(out_dir, exist_ok=True)

    n_done = 0
    for fn in list_bags(feat_dir):
        path = os.path.join(feat_dir, fn)
        coords = load_coords(path)
        if coords is None:
            print(f"* {fn}: no coords, skipping")
            continue
        feats = load_features(path)
        _, raw = encode_with_attention(params, cfg, jnp.asarray(feats[None]))
        sid = os.path.splitext(fn)[0]
        out = save_heatmap(os.path.join(out_dir, f"{sid}.png"), coords,
                           np.asarray(raw[0]), args.patch_size,
                           head=args.head)
        n_done += 1
    print(f"* Wrote {n_done} attention maps to {out_dir}")
