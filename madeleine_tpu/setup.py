"""Component setup family — API parity with the reference's setup_* surface
(ref: madeleine/utils/setup_components.py:86-247).

`bin/pretrain.py` composes these; they are exposed so reference users find the
same entry points. Each returns the TPU-native equivalent object.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.data.datasets import (
    BucketedBagLoader,
    SlideDataset,
    TrainLoader,
)
from madeleine_tpu.models.madeleine import init_madeleine_params


def setup(argv=None) -> MadeleineConfig:
    """Parse args, derive modalities/EXP_CODE/results dir, dump config.json
    (ref: setup_components.py:86-125)."""
    from madeleine_tpu.utils.args import get_config

    cfg = get_config(argv)
    os.makedirs(cfg.RESULTS_SAVE_PATH, exist_ok=True)
    cfg.save(os.path.join(cfg.RESULTS_SAVE_PATH, "config.json"))
    return cfg


def setup_dataset(cfg: MadeleineConfig,
                  rng: Optional[np.random.Generator] = None) -> SlideDataset:
    """(ref: setup_components.py:128-140)."""
    return SlideDataset(
        dataset_name=cfg.dataset,
        csv_path=cfg.csv_fpath,
        features_path=cfg.data_root_dir,
        sample=cfg.n_subsamples,
        modalities=cfg.MODALITIES,
        embedding_size=cfg.patch_embedding_dim,
        rng=rng or np.random.default_rng(cfg.seed),
    )


def setup_dataloader(cfg: MadeleineConfig, dataset: SlideDataset,
                     rng: Optional[np.random.Generator] = None) -> TrainLoader:
    """(ref: setup_components.py:142-152; shuffling train loader)."""
    return TrainLoader(dataset, cfg.batch_size, shuffle=True,
                       rng=rng or np.random.default_rng(cfg.seed))


def setup_downstream_datasets(
    cfg: MadeleineConfig,
    datasets: Optional[Dict[str, str]] = None,
) -> Dict[str, BucketedBagLoader]:
    """Downstream loaders keyed by name (ref: setup_components.py:34-58,154-173
    hardcodes BCNB; pass {"BCNB": "<dir>"} here)."""
    datasets = datasets or {}
    return {name: BucketedBagLoader(path) for name, path in datasets.items()}


def setup_model(cfg: MadeleineConfig, seed: Optional[int] = None):
    """Init params (ref: setup_components.py:175-192; mesh replaces
    nn.DataParallel — see setup_mesh)."""
    import jax

    return init_madeleine_params(jax.random.PRNGKey(seed or cfg.seed), cfg)


def setup_mesh(cfg: MadeleineConfig):
    """Data-parallel mesh over the configured device count (the DataParallel
    equivalent, ref: setup_components.py:185-187)."""
    import jax

    from madeleine_tpu.parallel.mesh import make_mesh

    n_dev = cfg.mesh_shape or len(jax.devices())
    return make_mesh(n_dev) if n_dev > 1 else None


def setup_optim(cfg: MadeleineConfig, steps_per_epoch: int):
    """AdamW + warmup/cosine schedule (ref: setup_components.py:194-209).
    Returns (optimizer, schedule)."""
    from madeleine_tpu.train.optim import make_optimizer

    return make_optimizer(cfg, steps_per_epoch)


def setup_losses(cfg: MadeleineConfig) -> Tuple:
    """(global_fn, local_fn, intra_fn) — None where disabled
    (ref: setup_components.py:211-247)."""
    import functools

    from madeleine_tpu.ops import losses as L

    loss_global = (functools.partial(L.info_nce, temperature=cfg.temperature)
                   if cfg.global_loss == "info-nce" else None)
    loss_local = L.got_loss if cfg.local_loss == "got" else None
    loss_intra = (L.make_intra_loss(cfg.intra_modality_mode_wsi,
                                    cfg.temperature)
                  if cfg.intra_modality_loss == "info-nce" else None)
    return loss_global, loss_local, loss_intra
