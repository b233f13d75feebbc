"""Train state + jitted train/eval step builders."""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vlp3d.config import Config
from vlp3d.losses.joint import compute_joint_loss
from vlp3d.models.jointnet import JointNet


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def canonicalize_tree(tree):
    """Strip weak_type flags from every array leaf.

    Weak-typed leaves appearing in the train-state after the first updates
    change the jit cache key and force 2 extra full recompiles (tens of
    minutes each on the remote TPU compiler) before the key stabilizes.
    convert_element_type to the same dtype clears weak_type; extended
    dtypes (PRNG keys) are left untouched.
    """

    def fix(x):
        if isinstance(x, jax.Array) and not jnp.issubdtype(
            x.dtype, jax.dtypes.extended
        ):
            return jax.lax.convert_element_type(x, x.dtype)
        return x

    return jax.tree_util.tree_map(fix, tree)


def create_state(
    model: JointNet,
    optimizer: optax.GradientTransformation,
    sample_batch: dict,
    seed: int = 0,
) -> TrainState:
    rngs = {
        "params": jax.random.key(seed),
        "dropout": jax.random.key(seed + 1),
        "aug": jax.random.key(seed + 2),
    }
    # jit the init: eager init dispatches thousands of tiny ops (very slow
    # over the axon tunnel); one compiled program instead
    variables = jax.jit(
        lambda b: model.init(rngs, b, train=True)
    )(sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return canonicalize_tree(
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=optimizer.init(params),
        )
    )


def make_train_step(
    model: JointNet,
    config: Config,
    optimizer: optax.GradientTransformation,
    *,
    caption: bool = False,
    reference: bool = True,
    detection: bool = True,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        drop_rng, aug_rng = jax.random.split(rng)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"dropout": drop_rng, "aug": aug_rng},
                mutable=["batch_stats"],
            )
            loss, metrics = compute_joint_loss(
                config,
                out,
                batch,
                caption=caption,
                reference=reference,
                detection=detection,
            )
            scalars = {
                k: v for k, v in metrics.items() if jnp.ndim(v) == 0
            }
            return loss, (scalars, updates.get("batch_stats", {}))

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        state = canonicalize_tree(
            TrainState(
                step=state.step + 1,
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
            )
        )
        return state, metrics

    return train_step


def make_eval_step(model: JointNet, config: Config, **loss_kwargs) -> Callable:
    """eval_step(state, batch) -> outputs dict + loss metrics (no grad)."""

    def eval_step(state: TrainState, batch: dict):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch,
            train=False,
        )
        _, metrics = compute_joint_loss(config, out, batch, **loss_kwargs)
        scalars = {k: v for k, v in metrics.items() if jnp.ndim(v) == 0}
        return out, scalars

    return eval_step
