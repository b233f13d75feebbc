"""Measure what train-state buffer donation buys at canonical shapes.

Compiles the full joint train step (batch 8 x 40960 pts, OID + OCC/OSC,
frozen-BERT-masked AdamW — the BASELINE.md joint_train config) twice —
with and without donate_argnums=(0,) — and reports the compiler's own
memory accounting (XLA CompiledMemoryStats): argument/output/temp bytes
and alias bytes (donated input buffers reused for outputs). The
transient-HBM saving of donation is the aliased byte count: without
donation the old and new train state coexist for the whole step.

The solver jits its train step with donation by default
(vlp3d/train/solver.py _get_steps; --no_donate opts out). The reference
has no analogue: torch optimizers mutate parameters in place by
construction (vendored AdamW, scripts/utils/AdamW.py:6).

Usage: python benchmarks/mem_donation.py [--batch 8] [--points 40960]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vlp3d.utils.jitcache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=40960)
    ap.add_argument("--time_steps", type=int, default=0,
                    help="also run this many sequential donated steps as "
                         "a liveness check (0 = compile-only accounting). "
                         "NOT a timing harness: per-call dispatch over "
                         "the axon relay dominates; step time comes from "
                         "benchmarks/run.py's streaming scan")
    args = ap.parse_args()

    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.data.synthetic import make_batch
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.schedules import cosine_lr
    from vlp3d.train.state import create_state, make_train_step

    config = Config(
        dataset=DatasetConfig(),
        model=ModelConfig(use_con=True, no_caption=True),
    )
    batch = make_batch(
        config, batch_size=args.batch, num_points=args.points, istrain=1
    )
    model = JointNet(config)
    opt = make_optimizer(
        lr_schedule=lambda e, lr0: cosine_lr(e, lr0, 200),
        steps_per_epoch=100,
    )
    state = create_state(model, opt, batch)
    state_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(state)
        if hasattr(leaf, "size") and hasattr(leaf.dtype, "itemsize")
    )
    step = make_train_step(model, config, opt, caption=False)
    rng = jax.random.key(0)

    def stats(donate):
        kw = {"donate_argnums": (0,)} if donate else {}
        compiled = jax.jit(step, **kw).lower(state, batch, rng).compile()
        ma = compiled.memory_analysis()
        return compiled, {
            "argument_mb": ma.argument_size_in_bytes / 1e6,
            "output_mb": ma.output_size_in_bytes / 1e6,
            "temp_mb": ma.temp_size_in_bytes / 1e6,
            "alias_mb": ma.alias_size_in_bytes / 1e6,
            # live-buffer proxy for the step's footprint: inputs stay
            # live, outputs + temps are allocated, aliased bytes are the
            # overlap the compiler reuses
            "peak_proxy_mb": (
                ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes
            ) / 1e6,
        }

    _, plain = stats(donate=False)
    compiled_d, donated = stats(donate=True)

    if args.time_steps:
        s = state
        for i in range(args.time_steps):
            s, metrics = compiled_d(s, batch, jax.random.fold_in(rng, i))
        loss = float(metrics["loss"])  # materialize = completion barrier
        assert jnp.isfinite(loss), loss

    print(json.dumps({
        "metric": "train_step_donation_saving",
        "value": round(donated["alias_mb"] - plain["alias_mb"], 1),
        "unit": "MB transient HBM",
        "state_mb": round(state_bytes / 1e6, 1),
        "no_donate": {k: round(v, 1) for k, v in plain.items()},
        "donate": {k: round(v, 1) for k, v in donated.items()},
        "donated_steps_ran": args.time_steps or None,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
