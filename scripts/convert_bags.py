"""Convert reference-schema h5/npz bags to the native .bag format.

Usage:
    python scripts/convert_bags.py --src <dir of .h5> [--dst <dir>] [--dtype bfloat16]

bfloat16 halves disk and IO bandwidth; features are bf16-rounded (CONCH
features tolerate this — the training path computes in bf16 anyway).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.data.io import list_bags
from madeleine_tpu.native.bagio import convert_to_bag

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", type=str, required=True)
    p.add_argument("--dst", type=str, default=None)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    args = p.parse_args()

    dst_dir = args.dst or args.src
    os.makedirs(dst_dir, exist_ok=True)
    files = list(list_bags(args.src))
    for i, fn in enumerate(files):
        dst = os.path.join(dst_dir, os.path.splitext(fn)[0] + ".bag")
        convert_to_bag(os.path.join(args.src, fn), dst, dtype=args.dtype)
        if (i + 1) % 200 == 0:
            print(f"* {i + 1}/{len(files)}")
    print(f"* Converted {len(files)} bags -> {dst_dir}")
