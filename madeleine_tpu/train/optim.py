"""Optimizer + LR schedule — optax, matching reference semantics.

Reference (ref: madeleine/utils/setup_components.py:194-209 + trainer.py:128-131):
AdamW(lr) with torch-default weight decay; per-step scheduler stepping where
- LinearLR warmup: factor 1e-5 -> 1.0 over ``warmup_epochs * steps_per_epoch``
  iters, but *stepped* through epoch ``warmup_epochs`` inclusive — i.e. the
  factor saturates at 1.0 and lr stays flat for one extra epoch;
- CosineAnnealingLR with T_max = (max_epochs - warmup_epochs) * steps_per_epoch
  and eta_min = end_learning_rate, stepped from epoch warmup_epochs+1 on.

We reproduce exactly that shape with optax.join_schedules:
warmup ramp (W steps) -> flat (1 epoch) -> cosine (T_max steps).
"""

from __future__ import annotations

from typing import Tuple

import optax

from madeleine_tpu.config import MadeleineConfig

WARMUP_START_FACTOR = 1e-5  # ref: setup_components.py:205


def make_lr_schedule(cfg: MadeleineConfig, steps_per_epoch: int) -> optax.Schedule:
    if cfg.warmup:
        warmup_steps = max(1, cfg.warmup_epochs * steps_per_epoch)
        cosine_steps = max(1, (cfg.max_epochs - cfg.warmup_epochs) * steps_per_epoch)
        warmup = optax.linear_schedule(
            init_value=cfg.lr * WARMUP_START_FACTOR,
            end_value=cfg.lr,
            transition_steps=warmup_steps,
        )
        flat = optax.constant_schedule(cfg.lr)
        cosine = optax.cosine_decay_schedule(
            init_value=cfg.lr,
            decay_steps=cosine_steps,
            alpha=cfg.end_learning_rate / cfg.lr,
        )
        return optax.join_schedules(
            [warmup, flat, cosine],
            boundaries=[warmup_steps, (cfg.warmup_epochs + 1) * steps_per_epoch],
        )
    cosine_steps = max(1, cfg.max_epochs * steps_per_epoch)
    return optax.cosine_decay_schedule(
        init_value=cfg.lr, decay_steps=cosine_steps,
        alpha=cfg.end_learning_rate / cfg.lr)


def make_optimizer(
    cfg: MadeleineConfig, steps_per_epoch: int
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW with the reference's schedule. optax.adamw applies
    weight_decay scaled by the learning rate, matching torch AdamW
    (ref leaves torch's default wd, setup_components.py:196)."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.adamw(
        learning_rate=schedule,
        b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=cfg.weight_decay,
    )
    return tx, schedule
