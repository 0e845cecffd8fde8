#!/bin/bash
# End-to-end demo on synthetic data — no external downloads.
#
#   ./walkthrough/run_synthetic_demo.sh [workdir]
#
# 1. renders synthetic "slides" (PNG) and segments/patches/embeds them
# 2. builds a synthetic multistain pretraining cohort + csv
# 3. pretrains MADELEINE for a few epochs
# 4. encodes a downstream cohort with the trained checkpoint
# 5. computes the mean-embedding baseline
# 6. runs few-shot linear probing on both embedding sets
#
# Runs on CPU by default (MADELEINE_TPU_PLATFORM=cpu); unset to use the TPU.

set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-$(mktemp -d /tmp/madeleine_demo.XXXX)}"
export MADELEINE_TPU_PLATFORM="${MADELEINE_TPU_PLATFORM:-cpu}"
echo "== workdir: $WORK (platform: $MADELEINE_TPU_PLATFORM)"

python - "$WORK" <<'EOF'
import sys, os
sys.path.insert(0, os.environ.get("REPO", "."))
import numpy as np, pandas as pd
from PIL import Image

work = sys.argv[1]
rng = np.random.default_rng(0)

# --- synthetic slides for the preprocessing stage -----------------------
os.makedirs(f"{work}/slides", exist_ok=True)
for i in range(2):
    img = np.full((1536, 2048, 3), 245, np.uint8)
    yy, xx = np.mgrid[0:1536, 0:2048]
    blob = ((xx - 700 - 300*i) ** 2 + (yy - 600) ** 2) < 350 ** 2
    img[blob] = rng.integers(60, 190, (blob.sum(), 3))
    Image.fromarray(img).save(f"{work}/slides/demo{i}.png")

# --- synthetic multistain pretrain cohort + downstream cohort ------------
from madeleine_tpu.data.io import write_bag

mods = ["HE", "HER2", "PGR", "KI67", "ER"]
os.makedirs(f"{work}/pretrain/feats", exist_ok=True)
rows = []
for i in range(24):
    sid = f"case{i}"
    labs = {"HE": 1, **{m: int(rng.random() < 0.8) for m in mods[1:]}}
    z = rng.standard_normal(8)
    for m, lab in labs.items():
        if lab:
            n = int(rng.integers(80, 300))
            base = z @ rng.standard_normal((8, 64)) * 0.5
            write_bag(f"{work}/pretrain/feats/{sid}_{m}.h5",
                      (base[None] + rng.standard_normal((n, 64))).astype("float32"))
    rows.append({"slide_id": sid, **labs, "split": "train"})
pd.DataFrame(rows).to_csv(f"{work}/pretrain/ACROBAT.csv", index=False)

os.makedirs(f"{work}/downstream/patch_embeddings", exist_ok=True)
proj = rng.standard_normal((8, 64)) * 0.5   # shared latent->feature map
ids, er = [], []
for i in range(70):
    y = i % 2
    z = rng.standard_normal(8) + 2.5 * y
    base = z @ proj
    n = int(rng.integers(60, 200))
    write_bag(f"{work}/downstream/patch_embeddings/b{i}.h5",
              (base[None] + rng.standard_normal((n, 64))).astype("float32"))
    ids.append(f"b{i}"); er.append(y)
pd.DataFrame({"slide_id": ids, "er": er, "pr": er, "her2": er}).to_csv(
    f"{work}/downstream/BCNB.csv", index=False)
print("== synthetic data ready")
EOF

echo "== [1/5] preprocessing (segment + patch + embed the PNG slides)"
python "$REPO/bin/extract_patch_embeddings.py" \
    --slide_dir "$WORK/slides" --local_dir "$WORK/preproc" \
    --patch_mag 10 --patch_size 64 --pixel_size 0.5

echo "== [2/5] pretraining"
python "$REPO/bin/pretrain.py" \
    --dataset ACROBAT --csv_fpath "$WORK/pretrain/ACROBAT.csv" \
    --data_root_dir "$WORK/pretrain/feats" --results_dir "$WORK/results" \
    --patch_embedding_dim 64 --wsi_encoder_hidden_dim 64 --n_heads 2 \
    --batch_size 8 --n_subsamples 64 --max_epochs 4 --warmup --warmup_epochs 1 \
    --global_loss info-nce --local_loss got --temperature 0.01 --symmetric_cl \
    --precision float32

RUN_DIR=$(ls -d "$WORK"/results/*/)
echo "== run dir: $RUN_DIR"

echo "== [3/5] downstream slide encoding with the trained checkpoint"
mkdir -p "$WORK/models/MADELEINE"
cp "$RUN_DIR/model.pt" "$RUN_DIR/model_config.json" "$WORK/models/MADELEINE/"
python "$REPO/bin/extract_slide_embeddings.py" \
    --local_dir "$WORK/downstream" --model_dir "$WORK/models" --no_download

echo "== [4/5] mean-embedding baseline"
python "$REPO/bin/extract_mean_embs.py" --local_dir "$WORK/downstream"

echo "== [5/5] few-shot linear probing (MADELEINE vs mean baseline)"
python "$REPO/bin/run_linear_probing.py" \
    --slide_embedding_pkl "$WORK/downstream/madeleine_slide_embeddings.pkl" \
    --label_path "$WORK/downstream/BCNB.csv"
python "$REPO/bin/run_linear_probing.py" \
    --slide_embedding_pkl "$WORK/downstream/mean_slide_embeddings.pkl" \
    --label_path "$WORK/downstream/BCNB.csv"

echo "== demo complete; artifacts in $WORK"
