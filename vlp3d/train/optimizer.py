"""Optimizer: decoupled AdamW with per-module LR groups.

Mirrors the reference's vendored AdamW + set_params_lr_dict
(scripts/utils/AdamW.py, scripts/utils/script_utils.py:3-31,
train_3dvlp.py:144-155): params under the lang / relation / match /
caption modules train at 5e-4 while everything else uses the base LR
(2e-3 in run.sh), weight decay 1e-3 (the --wd default). optax.adamw's
decoupled weight decay matches torch AdamW (wd scaled by lr).

LR schedules are per-epoch; the solver passes `steps_per_epoch` so the
optax step counter maps onto epochs.
"""

from __future__ import annotations

from typing import Callable

import optax

MODULE_LR_GROUPS = ("lang", "relation", "match", "caption")


def label_params(params) -> dict:
    """'module' for top-level submodules in MODULE_LR_GROUPS, else 'base'."""
    return {
        k: ("module" if k in MODULE_LR_GROUPS else "base")
        for k in params.keys()
    }


def make_optimizer(
    *,
    base_lr: float = 2e-3,
    module_lr: float = 5e-4,
    weight_decay: float = 1e-3,
    lr_schedule: Callable[[int], float] | None = None,
    steps_per_epoch: int = 1,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """lr_schedule maps epoch -> multiplier of the base LR (1.0 at epoch 0);
    both groups follow the same relative schedule, as torch's scheduler
    scales every param group.

    amsgrad: the reference's vendored AdamW supports --amsgrad
    (scripts/utils/AdamW.py max_exp_avg_sq branch); here scale_by_amsgrad
    replaces scale_by_adam in the same decoupled-decay chain.
    """

    def sched(lr0):
        if lr_schedule is None:
            return lr0
        return lambda step: lr0 * lr_schedule(step // steps_per_epoch)

    def adamw(lr0):
        if amsgrad:
            # mirror optax.adamw's chain with the AMSGrad second-moment rule
            return optax.chain(
                optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_learning_rate(sched(lr0)),
            )
        return optax.adamw(
            learning_rate=sched(lr0),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        )

    return optax.multi_transform(
        {"base": adamw(base_lr), "module": adamw(module_lr)},
        label_params,
    )
