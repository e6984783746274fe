"""Optimizers and LR schedules (optax).

The reference selects SGD / Adamax / Adam (scripts/main_gnn.py:160-167) and
damps the LR manually: lr <- lr * damping every epoch_step epochs
(main_gnn_qm9.py:218-219). Here that is an optax schedule over step count.
The reference's accidental per-epoch optimizer re-creation
(main_gnn_qm9.py:200, resetting Adamax moments every epoch) is available
behind OptimConfig.reset_each_epoch for exact-dynamics experiments.
"""

from __future__ import annotations

import optax

from hgnn2_tpu.training.config import OptimConfig


def stepped_decay(lr: float, damping: float, epoch_step: int, steps_per_epoch: int):
    """lr * damping^(epoch // epoch_step) as a step-count schedule."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return lr * (damping ** (epoch // max(epoch_step, 1)))

    return schedule


def build_optimizer(cfg: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = stepped_decay(cfg.lr, cfg.lr_damping, cfg.epoch_step, steps_per_epoch)
    if cfg.optim == "adamax":
        return optax.adamax(learning_rate=sched)
    if cfg.optim == "adam":
        return optax.adam(learning_rate=sched)
    if cfg.optim == "sgd":
        return optax.sgd(learning_rate=sched, momentum=cfg.momentum)
    raise ValueError(f"unknown optimizer {cfg.optim!r}")
