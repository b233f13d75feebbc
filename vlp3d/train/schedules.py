"""LR and BatchNorm-momentum schedules.

Cosine LR: torch CosineAnnealingLR stepped per epoch with T_max =
min(epochs, 200), eta_min 1e-5 (train_3dvlp.py:181-193). BN momentum:
0.5 * 0.5^(epoch // 20) floored at 1e-3 (solver_3dvlp.py:261-271) — used
for the detection-only/grounding pretrain configs (bn_decay set only when
no_caption, train_3dvlp.py:195-196). Values are in the torch convention;
flax BatchNorm takes 1 - momentum.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_lr(epoch, base_lr: float, t_max: int, eta_min: float = 1e-5):
    """Traceable: `epoch` may be a jax scalar (inside the optax schedule)."""
    e = jnp.minimum(epoch, t_max)
    return eta_min + (base_lr - eta_min) * (
        1 + jnp.cos(jnp.pi * e / t_max)
    ) / 2


def step_lr(epoch, base_lr: float, decay_steps, decay_rate: float):
    """MultiStepLR for detection-only runs (LR_DECAY_STEP=[80,120,160],
    rate 0.1; train_3dvlp.py:180, 194)."""
    k = sum((epoch >= s).astype(jnp.int32) if hasattr(epoch, "dtype")
            else int(epoch >= s) for s in decay_steps)
    return base_lr * (decay_rate**k)


def bn_momentum_torch(epoch: int, init: float = 0.5, rate: float = 0.5,
                      step: int = 20, floor: float = 1e-3):
    """Host-side (epoch loop), torch momentum convention."""
    return max(init * (rate ** (int(epoch) // step)), floor)
