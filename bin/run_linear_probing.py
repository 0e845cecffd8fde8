"""Few-shot linear probing on slide embeddings (ref: bin/run_linear_probing.py).

Usage:
    python run_linear_probing.py \
        --slide_embedding_pkl ../results/BCNB/madeleine_slide_embeddings.pkl \
        --label_path ../dataset_csv/BCNB/BCNB.csv
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()

from madeleine_tpu.eval.linear_probe import BCNB_BREAST_TASKS, eval_single_task

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--slide_embedding_pkl", type=str, default=None)
    parser.add_argument("--label_path", type=str, default=None)
    parser.add_argument("--tasks", type=str, nargs="*", default=None,
                        help="override task list (default inferred from csv name)")
    args = parser.parse_args()

    d_name = os.path.splitext(os.path.basename(args.label_path))[0]
    if args.tasks:
        tasks = args.tasks
    elif d_name == "BCNB":
        tasks = BCNB_BREAST_TASKS
    else:
        raise NotImplementedError(
            "Unknown dataset csv; pass --tasks to specify label columns.")

    print(f"* Evaluating on {tasks} status in {d_name}...")
    eval_single_task(
        embeds_path=args.slide_embedding_pkl,
        label_path=args.label_path,
        tasks=tasks,
        verbose=True,
    )
    print("\n" + 100 * "-" + "\nEnd of experiment, bye!\n" + 100 * "-")
