"""Build/validate dataset CSV manifests (see dataset_csv/README.md).

Two modes:
- --from_reference <dir>: copy ACROBAT.csv / BCNB.csv from a reference
  MADELEINE checkout (or any dir with dataset_csv/) and validate schemas.
- --scan_features <dir>: synthesize an ACROBAT-style manifest by scanning
  ``{slide_id}_{stain}.h5`` bag files.
"""

import argparse
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pandas as pd

from madeleine_tpu.config import MODALITY_DICTS

REQUIRED = {
    "ACROBAT": ["slide_id", "HE", "HER2", "PGR", "KI67", "ER", "split"],
    "BCNB": ["slide_id", "er", "pr", "her2"],
}


def validate(path: str, dataset: str) -> None:
    df = pd.read_csv(path)
    missing = [c for c in REQUIRED[dataset] if c not in df.columns]
    if missing:
        raise SystemExit(f"{path}: missing columns {missing}")
    print(f"* {path}: {len(df)} rows, schema OK")


def from_reference(ref_dir: str, out_root: str) -> None:
    for dataset in ("ACROBAT", "BCNB"):
        src = os.path.join(ref_dir, "dataset_csv", dataset, f"{dataset}.csv")
        if not os.path.exists(src):
            print(f"* {src} not found, skipping")
            continue
        dst_dir = os.path.join(out_root, dataset)
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, f"{dataset}.csv")
        shutil.copy(src, dst)
        validate(dst, dataset)


def scan_features(feat_dir: str, dataset: str, out: str) -> None:
    stains = MODALITY_DICTS.get(dataset, ["HE"])
    pat = re.compile(r"^(?P<sid>.+?)_(?P<stain>" + "|".join(stains) +
                     r")(?:_(?P<split>\w+))?\.(h5|npz)$")
    cases = {}
    for fn in sorted(os.listdir(feat_dir)):
        m = pat.match(fn)
        if not m:
            continue
        sid = m.group("sid")
        row = cases.setdefault(sid, {"slide_id": sid,
                                     **{s: 0 for s in stains},
                                     "split": "train"})
        row[m.group("stain")] = 1
        if m.group("split"):
            row["split"] = m.group("split")
    if not cases:
        raise SystemExit(f"no bag files matching {stains} in {feat_dir}")
    df = pd.DataFrame(list(cases.values()))
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    df.to_csv(out, index=False)
    print(f"* Wrote {out}: {len(df)} cases")
    validate(out, dataset) if dataset in REQUIRED else None


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--from_reference", type=str, default=None)
    p.add_argument("--scan_features", type=str, default=None)
    p.add_argument("--dataset", type=str, default="ACROBAT")
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--out_root", type=str, default="dataset_csv")
    args = p.parse_args()

    if args.from_reference:
        from_reference(args.from_reference, args.out_root)
    elif args.scan_features:
        out = args.out or os.path.join(args.out_root, args.dataset,
                                       f"{args.dataset}.csv")
        scan_features(args.scan_features, args.dataset, out)
    else:
        p.error("pass --from_reference or --scan_features")
