#!/bin/bash
# Full pipeline: pretrain both variants, then extract + probe downstream
# (ref: scripts/master.sh)

set -e
cd "$(dirname "$0")"

./launch_pretrain_withoutStainEncodings.sh
./launch_pretrain_withStainEncodings.sh

cd ../bin
python extract_slide_embeddings.py --local_dir ../results/BCNB/
python extract_mean_embs.py --local_dir ../results/BCNB/
python run_linear_probing.py \
    --slide_embedding_pkl ../results/BCNB/madeleine_slide_embeddings.pkl \
    --label_path ../dataset_csv/BCNB/BCNB.csv
python run_linear_probing.py \
    --slide_embedding_pkl ../results/BCNB/mean_slide_embeddings.pkl \
    --label_path ../dataset_csv/BCNB/BCNB.csv
