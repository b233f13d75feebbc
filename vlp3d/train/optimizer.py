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

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

MODULE_LR_GROUPS = ("lang", "relation", "match", "caption")


class _AmsgradState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_amsgrad_torch(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """AMSGrad with torch's formulation (scripts/utils/AdamW.py:100-110):
    the running max is over the RAW second moment, bias-corrected at
    read time — denom = sqrt(max_t nu_t)/sqrt(1-b2^t) + eps. optax's
    scale_by_amsgrad instead maxes the bias-corrected nu_hat, which
    weights early steps differently; tests/test_refparity_optimizer.py
    pins the torch trajectory."""

    def init_fn(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return _AmsgradState(jnp.zeros([], jnp.int32), z, z, z)

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(
            lambda g, m: b1 * m + (1 - b1) * g, updates, state.mu
        )
        nu = jax.tree.map(
            lambda g, v: b2 * v + (1 - b2) * g * g, updates, state.nu
        )
        nu_max = jax.tree.map(jnp.maximum, state.nu_max, nu)
        count = state.count + 1
        bc1 = 1 - b1**count.astype(jnp.float32)
        bc2 = 1 - b2**count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v) / jnp.sqrt(bc2) + eps),
            mu,
            nu_max,
        )
        return out, _AmsgradState(count, mu, nu, nu_max)

    return optax.GradientTransformation(init_fn, update_fn)


# param subtrees the model freezes with stop_gradient (frozen BERT text
# encoder, lang_bert_module.py:84-95 / models/bert.py freeze_bert). torch
# excludes requires_grad=False params from every param group
# (script_utils.py:14-16), so they see NEITHER updates NOR decoupled
# weight decay; with optax the zero grads alone would still let adamw's
# add_decayed_weights shrink them every step — these prefixes are mapped
# to optax.set_to_zero() instead.
FROZEN_PREFIXES: tuple = (("lang", "text_encoder"),)


def label_params(params, single_group: bool = False):
    """Label pytree: 'frozen' under FROZEN_PREFIXES, 'module' for
    top-level submodules in MODULE_LR_GROUPS (multi-group mode), else
    'base'."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    labels = []
    for path, _ in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        if any(keys[: len(p)] == p for p in FROZEN_PREFIXES):
            labels.append("frozen")
        elif not single_group and keys and keys[0] in MODULE_LR_GROUPS:
            labels.append("module")
        else:
            labels.append("base")
    return jax.tree_util.tree_unflatten(treedef, labels)


def make_optimizer(
    *,
    base_lr: float = 2e-3,
    module_lr: float = 5e-4,
    weight_decay: float = 1e-3,
    lr_schedule: Callable[[int, float], float] | None = None,
    steps_per_epoch: int = 1,
    amsgrad: bool = False,
    optim_name: str = "adamw",
    single_group: bool = False,
    clip_grad_value: float = 0.0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """lr_schedule maps (epoch, group_base_lr) -> absolute LR for that
    group. torch LR schedulers run per param group on the group's own
    base_lr (e.g. CosineAnnealingLR anneals EVERY group to the same
    eta_min=1e-5, train_3dvlp.py:181-193) — a shared multiplier would
    instead scale eta_min by module_lr/base_lr, so the per-group form is
    the parity-correct one (pinned by tests/test_refparity_optimizer.py).

    amsgrad: the reference's vendored AdamW supports --amsgrad
    (scripts/utils/AdamW.py max_exp_avg_sq branch); here
    scale_by_amsgrad_torch (raw-second-moment max, torch's formulation)
    replaces scale_by_adam in the same decoupled-decay chain.

    optim_name "adam": torch Adam with COUPLED L2 decay (wd*p added to
    the grad before the moment updates) — the VQA paths' default
    optimizer (scripts/joint_scripts/train_qa.py:145-159, optim.Adam).
    single_group: one param group at base_lr (model.parameters(), as the
    VQA scripts build it) instead of the joint lang/relation/match/
    caption split. clip_grad_value > 0: clip raw gradient VALUES first
    (the VQA solver's nn.utils.clip_grad_value_, lib/vqa/solver.py:
    336-339 — clip_grad_value_, despite the arg's max_grad_norm name).

    grad_accum > 1: gradient accumulation (a scaling knob the reference
    lacks) — grads are MEANed over grad_accum consecutive micro-steps
    and the inner update (moments, LR count, weight decay) runs once per
    effective step, so grad_accum micro-batches reproduce one step at
    grad_accum x batch_size exactly (batch-mean losses; BN running
    stats still update per micro-batch — the same deviation any
    accumulation scheme has). The accumulator tree mirrors the params,
    so ZeRO-1's param-aware moment sharding covers it too. LR schedules
    count EFFECTIVE updates: callers pass steps_per_epoch already
    divided by grad_accum (solver does this).
    """

    def sched(lr0):
        if lr_schedule is None:
            return lr0
        return lambda step: lr_schedule(step // steps_per_epoch, lr0)

    def core(lr0):
        if optim_name == "adam":
            second = (
                scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8)
                if amsgrad
                else optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
            )
            return optax.chain(
                # coupled L2: decay enters the grads BEFORE the moments
                optax.add_decayed_weights(weight_decay),
                second,
                optax.scale_by_learning_rate(sched(lr0)),
            )
        if amsgrad:
            # mirror optax.adamw's chain with the AMSGrad second-moment rule
            return optax.chain(
                scale_by_amsgrad_torch(b1=0.9, b2=0.999, eps=1e-8),
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

    transforms = {"base": core(base_lr), "frozen": optax.set_to_zero()}
    if not single_group:
        transforms["module"] = core(module_lr)
    tx = optax.multi_transform(
        transforms, lambda p: label_params(p, single_group)
    )
    if clip_grad_value and clip_grad_value > 0:
        tx = optax.chain(optax.clip(clip_grad_value), tx)
    if grad_accum and grad_accum > 1:
        ms = optax.MultiSteps(tx, every_k_schedule=int(grad_accum))
        tx = optax.GradientTransformation(ms.init, ms.update)
    return tx
