"""Extract MADELEINE slide embeddings for a directory of patch-embedding bags.

Usage (CLI-compatible with ref: bin/extract_slide_embeddings.py):
    python extract_slide_embeddings.py --local_dir ../results/BCNB/

Reads ``<local_dir>/patch_embeddings/*.h5`` bags, encodes them with the
pretrained MADELEINE checkpoint (HF hub or local ``--model_dir``), and writes
``<local_dir>/madeleine_slide_embeddings.pkl`` in the reference schema
{"embeds": np.ndarray, "slide_ids": list}.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()

from madeleine_tpu.eval.inference import get_downstream_loader, run_inference
from madeleine_tpu.models.factory import create_model_from_pretrained
from madeleine_tpu.utils.file_utils import save_pkl

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--local_dir", type=str, default=None)
    parser.add_argument("--model_dir", type=str, default="./../models")
    parser.add_argument("--no_download", action="store_true",
                        help="use local checkpoint files only")
    parser.add_argument("--tokens_per_batch", type=int, default=262144)
    args = parser.parse_args()

    cfg, params, dtype = create_model_from_pretrained(
        os.path.join(args.model_dir, "MADELEINE"), download=not args.no_download)

    loader = get_downstream_loader(args.local_dir,
                                   tokens_per_batch=args.tokens_per_batch)
    results_dict, rank = run_inference(params, cfg, loader, dtype=dtype)
    save_pkl(os.path.join(args.local_dir, "madeleine_slide_embeddings.pkl"),
             results_dict)
    print(f"* Saved {len(results_dict['slide_ids'])} embeddings "
          f"(rank={rank:.2f}) to madeleine_slide_embeddings.pkl")
