"""Mean-of-patch-embeddings baseline (ref: bin/extract_mean_embs.py).

Usage:
    python extract_mean_embs.py --local_dir ../results/BCNB/

Writes ``<local_dir>/mean_slide_embeddings.pkl`` in the same schema as the
MADELEINE embeddings, for the CONCH-mean baseline rows of the README table.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()

import numpy as np

from madeleine_tpu.data.io import list_bags, load_features
from madeleine_tpu.utils.file_utils import save_pkl

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--local_dir", type=str, default=None)
    args = parser.parse_args()

    path_to_patches = os.path.join(args.local_dir, "patch_embeddings")
    if not os.path.isdir(path_to_patches):
        path_to_patches = args.local_dir

    all_embeds, all_ids = [], []
    for fn in list_bags(path_to_patches):
        feats = load_features(os.path.join(path_to_patches, fn))
        all_embeds.append(feats.mean(axis=0))
        all_ids.append(os.path.splitext(fn)[0])

    os.makedirs(args.local_dir, exist_ok=True)
    save_pkl(os.path.join(args.local_dir, "mean_slide_embeddings.pkl"),
             {"embeds": np.asarray(all_embeds), "slide_ids": all_ids})
    print(f"* Saved {len(all_ids)} mean embeddings")
