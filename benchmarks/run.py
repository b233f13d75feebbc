"""Benchmark suite — the five configs from BASELINE.md.

Each benchmark measures steady-state step time with the streaming-scan
harness (loop-carried input perturbation defeats CSE hoisting; one
dispatch amortizes the ~30ms axon relay cost) and prints one JSON line.

Usage:
  python benchmarks/run.py --bench sa_stack|detection|grounding|captioning|joint_train
  python benchmarks/run.py --bench all
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

BATCH = 8  # overridable via --batch (canonical reference config is 8)
NUM_POINTS = 40960
REPS = 6


def _steady_ms(step_fn, *operands, reps=REPS):
    """Wall-time one scan dispatch of `reps` sequential steps.

    operands are passed as jit ARGUMENTS — closing over device arrays
    would embed them as HLO literals and blow the remote-compile request
    limit (HTTP 413) at 177MB batches.

    Two relay pitfalls this harness defends against (measured, PERF.md
    "Benchmark integrity"):
      * `jax.block_until_ready` does NOT block on the axon backend —
        dispatch returns in ~1-2 ms while the device runs; only VALUE
        materialization (float()/np.asarray) waits for completion. Time
        to materialization, and assert the result exceeds the ~30 ms
        relay floor.
      * each timed call gets a DISTINCT seed argument mixed into the
        loop carry, and the carry feedback must be large enough not to
        round away (1e-12 of the consumed sum) — otherwise the whole
        scan body is identical work XLA/the relay may elide."""

    @jax.jit
    def run(seed, *ops):
        return jax.lax.scan(
            lambda c, _: step_fn(c, *ops), seed * 1e-6, None, length=reps
        )[0]

    float(run(jnp.float32(0), *operands))  # compile + warm
    walls = []
    for seed in (1, 2):
        # two timed dispatches, keep the faster: the relay's dispatch
        # latency is bimodal between calls (PERF.md "relay variance"),
        # and one unlucky mode shouldn't stamp the round artifact
        t0 = time.perf_counter()
        float(run(jnp.float32(seed), *operands))  # materialize = complete
        walls.append((time.perf_counter() - t0) * 1e3)
    wall = min(walls)
    assert wall > 5.0, (
        f"benchmark returned in {wall:.3f} ms — below the relay dispatch "
        "floor, so no device work was measured"
    )
    return wall / reps


def _emit(name, ms, extra=None):
    extra = dict(extra or {})
    if "floor_ms" in extra:
        # speed-of-light fraction: measured / structural floor
        extra["x_floor"] = round(ms / extra["floor_ms"], 2)
    print(
        json.dumps(
            {
                "benchmark": name,
                "step_ms": round(ms, 2),
                "scenes_per_sec_per_chip": round(BATCH / (ms / 1e3), 1),
                "batch_size": BATCH,
                "num_points": NUM_POINTS,
                **extra,
            }
        )
    )


def _batch(config, istrain):
    from vlp3d.data.synthetic import make_batch
    from vlp3d.parallel.mesh import DEVICE_BATCH_KEYS

    b = make_batch(
        config, batch_size=BATCH, num_points=NUM_POINTS, istrain=istrain
    )
    return jax.device_put(
        {k: v for k, v in b.items() if k in DEVICE_BATCH_KEYS}
    )


def _floor_fields(floor_ms_b8: float, basis: str):
    """Speed-of-light annotation (VERDICT r04 item 6): structural floor
    scaled from its batch-8 derivation, so every suite entry carries how
    far from the hardware limit the exact-parity semantics run (_emit
    adds x_floor = measured/floor). The gather/VPU-bound floors scale
    linearly in batch."""
    floor = floor_ms_b8 * (BATCH / 8.0)
    return {"floor_ms": round(floor, 2), "floor_basis": basis}


def bench_sa_stack():
    """BASELINE.md #1: the PointNet++ SA stack (FPS + ball query +
    grouping + MLPs) alone."""
    from vlp3d.models.backbone import PointNet2Backbone

    rng = np.random.default_rng(0)
    pc = jax.device_put(
        jnp.asarray(
            rng.uniform(0, 5, (BATCH, NUM_POINTS, 3 + 132)).astype(np.float32)
        )
    )
    net = PointNet2Backbone(input_feature_dim=132)
    v = jax.jit(lambda x: net.init({"params": jax.random.key(0)}, x))(pc)

    def step(c, v, pc):
        out = net.apply(v, pc.at[:, :, 0].add(c))
        # consume the FULL output: feeding one element back lets XLA
        # dead-code-slice the rest of the stack (measured 0.05 ms "steps")
        return c + 1e-12 * jnp.sum(out["fp2_features"]), None

    _emit(
        "pointnet2_sa_stack", _steady_ms(step, v, pc),
        _floor_fields(11.3, "sum of analyzed SA1 whale floors (leaf-row "
                            "gathers ~6.5 + ball query ~2.0 + FPS ~2.8 ms, "
                            "PERF.md train-step profile) — a strict "
                            "underestimate: SA2-4/FP/MLP floors not "
                            "included"),
    )


def _jointnet(no_reference, no_caption, use_con, istrain):
    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.models.jointnet import JointNet

    config = Config(
        dataset=DatasetConfig(),
        model=ModelConfig(
            no_reference=no_reference, no_caption=no_caption, use_con=use_con
        ),
    )
    batch = _batch(config, istrain)
    model = JointNet(config)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(batch)
    return config, model, variables, batch


def bench_detection():
    """BASELINE.md #2: VoteNet-style detection (votes -> proposals)."""
    config, model, v, batch = _jointnet(True, True, False, 0)

    def step(c, v, batch):
        b2 = dict(batch)
        b2["point_clouds"] = batch["point_clouds"] + c
        out = model.apply(v, b2, train=False)
        consumed = (
            jnp.sum(out["pred_center"]) + jnp.sum(out["pred_size"])
            + jnp.sum(out["objectness_scores"])
        )
        return c + 1e-12 * consumed, None

    _emit(
        "votenet_detection", _steady_ms(step, v, batch),
        _floor_fields(11.3, "analyzed SA1 whale floors only (PERF.md "
                            "train-step profile); voting/proposal floors "
                            "not derived — strict underestimate"),
    )


def bench_grounding():
    """BASELINE.md #3: ScanRefer grounding end-to-end (the bench.py
    flagship path)."""
    config, model, v, batch = _jointnet(False, True, False, 0)

    def step(c, v, batch):
        b2 = dict(batch)
        b2["point_clouds"] = batch["point_clouds"] + c
        out = model.apply(v, b2, train=False)
        consumed = jnp.sum(out["cluster_ref"]) + jnp.sum(out["pred_center"])
        return c + 1e-12 * consumed, None

    _emit(
        "scanrefer_grounding", _steady_ms(step, v, batch),
        _floor_fields(11.3, "analyzed SA1 whale floors only (PERF.md "
                            "train-step profile); BERT/match/relation "
                            "floors not derived — strict underestimate"),
    )


def bench_captioning():
    """BASELINE.md #4: dense captioning — proposals + greedy decode of a
    caption per proposal (the eval_cap hot loop)."""
    from vlp3d.models.caption import CaptionDecoder, greedy_decode

    config, model, v, batch = _jointnet(False, False, False, 0)
    decoder = CaptionDecoder(
        vocab_size=config.model.vocab_size,
        max_len=config.model.max_des_len + 2,
    )
    cap_vars = {"params": v["params"]["caption"]}

    def step(c, v, batch, cap_vars):
        b2 = dict(batch)
        b2["point_clouds"] = batch["point_clouds"] + c
        out = model.apply(v, b2, train=False)
        feats = out["aggregated_vote_features"]
        b, k, ch = feats.shape
        ys = greedy_decode(
            decoder, cap_vars, (feats * 2.0).reshape(b * k, 1, ch),
            config.model.max_des_len,
        )
        return c + 1e-12 * jnp.sum(ys.astype(jnp.float32)), None

    ms = _steady_ms(step, v, batch, cap_vars, reps=2)
    _emit("scan2cap_captioning", ms, {"captions_per_step": 8 * 256})


def bench_joint_train():
    """BASELINE.md #5: full joint pretrain step (OID + OCC/OSC + backward
    + AdamW)."""
    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.schedules import cosine_lr
    from vlp3d.train.state import create_state, make_train_step

    config = Config(
        dataset=DatasetConfig(),
        model=ModelConfig(use_con=True, no_caption=True),
    )
    batch = _batch(config, 1)
    model = JointNet(config)
    opt = make_optimizer(
        lr_schedule=lambda e, lr0: cosine_lr(e, lr0, 200), steps_per_epoch=100
    )
    state = create_state(model, opt, batch)
    train_step = make_train_step(model, config, opt, caption=False)
    rng = jax.random.key(0)

    @jax.jit
    def run(state, batch):
        def body(s, i):
            return train_step(s, batch, jax.random.fold_in(rng, i))
        s, ms = jax.lax.scan(body, state, jnp.arange(REPS))
        return s, ms["loss"]

    s2, losses = run(state, batch)
    float(losses.sum())  # materialization = completion (not block_until_ready)
    walls = []
    for _ in range(2):  # keep the faster dispatch (relay bimodality)
        t0 = time.perf_counter()
        s2, losses = run(s2, batch)
        float(losses.sum())
        walls.append(time.perf_counter() - t0)
    ms = min(walls) / REPS * 1e3
    assert ms * REPS > 5.0, "below relay dispatch floor — nothing measured"
    _emit("joint_pretrain_train_step", ms,
          {"loss_finite": bool(jnp.isfinite(losses).all()),
           **_floor_fields(
               30.0, "sum of analyzed fwd+bwd whale floors (PERF.md "
                     "train-step device profile: SA1 gathers ~6.5, ball "
                     "query ~2.0, FPS ~2.8, residual stash ~3.8, "
                     "scatter-backward fusions ~7, BN/attention/loss "
                     "tail ~8) — every named op measured within ~2x of "
                     "its floor; tail floors approximate")})


def bench_op_floors():
    """Speed-of-light fractions for the two endgame'd kernels, measured
    standalone at canonical shapes vs their DERIVED structural floors
    (VERDICT r04 item 6 — the driver artifact itself carries the
    MFU-equivalent evidence for this gather/VPU-bound workload):

      * Pallas FPS 40960 -> 2048: ~2.8 ms pure VPU issue for the exact
        dense algorithm (PERF.md "FPS endgame analysis" — 2047 iters x
        ~7-8 passes over the (8, 40960) state at ~2 ops/cycle).
      * SA1 ball query (r=0.2, 64 nbrs, 2048 centers): ~2.0 ms for the
        671M FMA-form distance evaluations the scan-order first-k
        reference semantics require (PERF.md ball-query endgame).

    Both floors scale linearly in batch. reps=24 amortizes the
    ~30 ms relay dispatch to ~1 ms/step so the fraction reflects
    the kernel, not the tunnel."""
    from vlp3d.ops import ball_query, furthest_point_sample, gather_points

    rng = np.random.default_rng(0)
    xyz = jax.device_put(
        jnp.asarray(
            rng.uniform(0, 5, (BATCH, NUM_POINTS, 3)).astype(np.float32)
        )
    )

    def fps_step(c, xyz):
        idx = furthest_point_sample(xyz.at[:, 0, 0].add(c * 1e-7), 2048)
        return c + 1e-12 * jnp.sum(idx.astype(jnp.float32)), None

    ms = _steady_ms(fps_step, xyz, reps=24)
    _emit("op_fps", ms,
          _floor_fields(2.8, "VPU issue floor of the exact dense "
                             "algorithm (PERF.md 'FPS endgame analysis')"))

    centers = jax.jit(
        lambda x: gather_points(x, furthest_point_sample(x, 2048))
    )(xyz)

    def bq_step(c, xyz, centers):
        idx = ball_query(0.2, 64, xyz.at[:, 0, 0].add(c * 1e-7), centers)
        return c + 1e-12 * jnp.sum(idx.astype(jnp.float32)), None

    ms = _steady_ms(bq_step, xyz, centers, reps=24)
    _emit("op_ball_query", ms,
          _floor_fields(2.0, "VPU floor of the 671M FMA-form distance "
                             "evaluations the exact scan-order first-k "
                             "semantics require (PERF.md)"))


BENCHES = {
    "sa_stack": bench_sa_stack,
    "op_floors": bench_op_floors,
    "detection": bench_detection,
    "grounding": bench_grounding,
    "captioning": bench_captioning,
    "joint_train": bench_joint_train,
}


def main():
    global BATCH
    p = argparse.ArgumentParser()
    p.add_argument("--bench", default="all", choices=[*BENCHES, "all"])
    p.add_argument("--batch", type=int, default=BATCH)
    args = p.parse_args()
    BATCH = args.batch
    names = list(BENCHES) if args.bench == "all" else [args.bench]
    for n in names:
        BENCHES[n]()


if __name__ == "__main__":
    main()
