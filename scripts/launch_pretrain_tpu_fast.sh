#!/bin/bash
# Canonical ACROBAT pretraining at the TPU-tuned fast configuration:
# same hyperparameters/semantics as launch_pretrain_withoutStainEncodings.sh
# (ref: scripts/launch_pretrain_withoutStainEncodings.sh:4-29), plus the
# TPU-native execution knobs (see docs/DEPLOYMENT.md):
#   --no_remat           keep embedder residuals (~3.5 GB — fits a v5e)
#   --no_modality_scan   one joint [batch x stains] embedder batch
# Measured: 256 ms/step device-side at this scale (BASELINE.md).

cd "$(dirname "$0")/../bin" || exit 1

python pretrain.py \
    --cohort brca \
    --dataset ACROBAT \
    --csv_fpath ../dataset_csv/ACROBAT/ACROBAT.csv \
    --data_root_dir ../data/pretrain/ACROBAT/feats_h5 \
    --results_dir ../results \
    --wsi_encoder abmil \
    --n_heads 4 \
    --patch_embedding_dim 512 \
    --wsi_encoder_hidden_dim 512 \
    --activation softmax \
    --global_loss info-nce \
    --local_loss got \
    --temperature 0.001 \
    --symmetric_cl \
    --lr 0.0001 \
    --max_epochs 120 \
    --batch_size 65 \
    --n_subsamples 2048 \
    --warmup \
    --warmup_epochs 5 \
    --precision bfloat16 \
    --no_remat \
    --no_modality_scan \
    "$@"
