"""Few-shot linear probing (ref: bin/run_linear_probing.py).

Protocol parity: k in {1, 10, 25} slides/class x 10 folds (seed = fold),
sklearn LogisticRegression(C=1, max_iter=10000, random_state=0), AUC
(ovr-macro when multiclass) + balanced accuracy; per-(k, task) pickle of the
metric store (ref: run_linear_probing.py:119-194).

Deviation: the reference's isup_grade kappa branch crashes (it appends to an
uninitialized "q_kappa" key, ref: run_linear_probing.py:162-165); here the key
is initialized so the quadratic-kappa path works.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from madeleine_tpu.utils.file_utils import load_pkl
from madeleine_tpu.utils.seed import set_deterministic_mode

BCNB_BREAST_TASKS = ["er", "pr", "her2"]
ALL_K = (1, 10, 25)
NUM_FOLDS = 10


def calculate_metrics(y_true, y_pred, pred_scores) -> Tuple[float, float]:
    """AUC + balanced accuracy (ref: run_linear_probing.py:35-51)."""
    from sklearn.metrics import balanced_accuracy_score, roc_auc_score

    if len(np.unique(y_true)) > 2:
        auc = roc_auc_score(y_true, pred_scores, multi_class="ovr", average="macro")
    else:
        auc = roc_auc_score(y_true, pred_scores[:, 1])
    bacc = balanced_accuracy_score(y_true, y_pred)
    return float(auc), float(bacc)


def load_and_split(
    labels: pd.DataFrame,
    embedding_path: str,
    study: str,
    k: int = 1,
    normalize: bool = False,
):
    """k-per-class train split via pandas .sample under the fold seed
    (ref: run_linear_probing.py:54-111)."""
    obj = load_pkl(embedding_path)
    embeddings = np.asarray(obj["embeds"])
    if normalize:
        from sklearn.preprocessing import StandardScaler

        embeddings = StandardScaler().fit_transform(embeddings)
    slide_ids = [str(x) for x in obj["slide_ids"]]
    emb_by_id = {n: e for e, n in zip(embeddings, slide_ids)}

    intersection = list(set(labels["slide_id"].tolist()) & set(slide_ids))
    labels = labels[labels["slide_id"].isin(intersection)]
    classes = sorted(labels[study].unique())

    train_ids: List[str] = []
    for cls in classes:
        cls_rows = labels[labels[study] == cls]
        k_eff = min(k, len(cls_rows))
        if k_eff < k:
            print(f"* warning: class {cls} has only {len(cls_rows)} slides; "
                  f"sampling k={k_eff} (reference would crash here)")
        train_ids += cls_rows.sample(k_eff)["slide_id"].tolist()
    test_ids = labels[~labels["slide_id"].isin(train_ids)]["slide_id"].tolist()

    lab_by_id = dict(zip(labels["slide_id"], labels[study]))
    x_train = np.stack([emb_by_id[n] for n in train_ids])
    x_test = np.stack([emb_by_id[n] for n in test_ids])
    y_train = np.asarray([lab_by_id[n] for n in train_ids])
    y_test = np.asarray([lab_by_id[n] for n in test_ids])
    return x_train, y_train, x_test, y_test


def eval_single_task(
    embeds_path: str,
    label_path: str,
    tasks: Sequence[str],
    *,
    ks: Sequence[int] = ALL_K,
    num_folds: int = NUM_FOLDS,
    verbose: bool = True,
    save: bool = True,
) -> Dict[Tuple[int, str], Dict[str, List[float]]]:
    """Full probing sweep (ref: run_linear_probing.py:114-194). Returns
    {(k, task): {"auc": [...], "bacc": [...], ...}} and writes the reference's
    per-(k, task) pickles next to the embedding pkl."""
    from sklearn.linear_model import LogisticRegression

    m_name = os.path.splitext(os.path.basename(embeds_path))[0]
    save_path = os.path.join(os.path.dirname(embeds_path), "res_linear_probing")

    all_metrics: Dict[Tuple[int, str], Dict[str, List[float]]] = {}
    for k in ks:
        for task in tasks:
            metrics_store: Dict[str, List[float]] = {"auc": [], "bacc": [],
                                                     "q_kappa": []}
            for fold in range(num_folds):
                set_deterministic_mode(fold)
                labels = pd.read_csv(label_path)
                labels["slide_id"] = labels["slide_id"].astype(str)
                labels = labels[labels[task] != -1][["slide_id", task]]

                x_tr, y_tr, x_te, y_te = load_and_split(labels, embeds_path,
                                                        task, k)
                if len(y_te) == 0 or len(np.unique(y_tr)) < 2:
                    # cohort too small for this k: all slides consumed by the
                    # train split (or a single-class train set) — skip the
                    # fold instead of crashing (tiny synthetic cohorts)
                    print(f"* warning: k={k} task={task} fold={fold}: "
                          f"degenerate split (|test|={len(y_te)}); skipped")
                    continue
                clf = LogisticRegression(C=1, max_iter=10000, verbose=0,
                                         random_state=0)
                clf.fit(x_tr, y_tr)
                y_pred = clf.predict(x_te)
                scores = clf.predict_proba(x_te)

                if task == "isup_grade":
                    from sklearn.metrics import (balanced_accuracy_score,
                                                 cohen_kappa_score)

                    metrics_store["q_kappa"].append(float(
                        cohen_kappa_score(y_te, y_pred, weights="quadratic")))
                    metrics_store["bacc"].append(float(
                        balanced_accuracy_score(y_te, y_pred)))
                else:
                    auc, bacc = calculate_metrics(y_te, y_pred, scores)
                    metrics_store["auc"].append(auc)
                    metrics_store["bacc"].append(bacc)

            all_metrics[(k, task)] = metrics_store
            if verbose:
                if task == "isup_grade":
                    print(f"k={k}, task={task}, quadratic kappa="
                          f"{np.mean(metrics_store['q_kappa']):.3f}")
                else:
                    print(f"k={k}, task={task}, "
                          f"auc={np.mean(metrics_store['auc']):.3f} "
                          f"+/- {np.std(metrics_store['auc']):.3f}")
            if save:
                folder = f"k={k}_probing_{task.replace('/', '')}"
                os.makedirs(os.path.join(save_path, m_name), exist_ok=True)
                with open(os.path.join(save_path, m_name, f"{folder}.pickle"),
                          "wb") as f:
                    pickle.dump({"tangle": metrics_store}, f,
                                protocol=pickle.HIGHEST_PROTOCOL)
    return all_metrics
