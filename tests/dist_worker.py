"""Multi-host DCN worker: a data-parallel train step over a 2-process
global CPU mesh (2 virtual devices per process). Launched by
tests/test_distributed.py with RANK / WORLD_SIZE / MASTER_ADDR /
MASTER_PORT set (the reference's env:// rendezvous mode,
utils/dist.py:7-13).

The step is deliberately small (a two-layer regression net trained with
the framework's real AdamW optimizer): the host this runs on may have a
single CPU core, and two concurrent multi-minute XLA compiles of the
full JointNet step starve each other into gloo timeouts. Full-model
multi-device execution is validated by `__graft_entry__.dryrun_multichip`
(single-process virtual mesh); THIS test proves what that one cannot —
that the distributed module's rendezvous, coordination barrier,
cross-process batch assembly (`shard_host_batch`), state replication
(`replicate_global`), and gloo-backed collectives work across real
process boundaries.

Prints ``DIST_OK rank=<r> loss=<v> pnorm=<v>`` on success; the parent
asserts both ranks print identical values. Each process feeds a
DIFFERENT local batch half, so agreement requires the loss/gradient
reductions to have spanned both processes.
"""

import os
import re
import sys

# pin the virtual CPU platform BEFORE any jax backend init; force the
# device count even if the pytest parent exported its own 8-device
# XLA_FLAGS (tests/conftest.py) into our environment
flags = os.environ.get("XLA_FLAGS", "")
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vlp3d.parallel.distributed import (  # noqa: E402
    barrier,
    dist_init,
    global_mesh,
    replicate_global,
    shard_host_batch,
)


def main() -> None:
    ctx = dist_init(cpu_collectives="gloo")
    assert ctx.distributed, "expected env:// rendezvous vars"
    assert jax.process_count() == ctx.world_size == 2
    assert jax.local_device_count() == 2

    import jax.numpy as jnp

    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.schedules import cosine_lr

    mesh = global_mesh()
    assert mesh.devices.size == 4
    barrier("dist_worker_start")

    global_bs, local_bs = 8, 4
    rng = np.random.default_rng(0)
    # both processes build the identical global batch (same seed), then
    # keep only their own process slice — the multi-host data-loader shape
    full = {
        "point_clouds": rng.normal(size=(global_bs, 64, 3)).astype(np.float32),
        "center_label": rng.normal(size=(global_bs, 3)).astype(np.float32),
    }
    lo, hi = ctx.rank * local_bs, (ctx.rank + 1) * local_bs
    local = {k: v[lo:hi] for k, v in full.items()}
    sharded = shard_host_batch(mesh, local)
    for v in sharded.values():
        assert not v.is_fully_addressable  # genuinely cross-host

    params = {
        "w1": rng.normal(size=(3, 32)).astype(np.float32) * 0.1,
        "w2": rng.normal(size=(32, 3)).astype(np.float32) * 0.1,
    }
    optimizer = make_optimizer(
        lr_schedule=lambda e, lr0: cosine_lr(e, lr0, 200), steps_per_epoch=10
    )
    opt_state = optimizer.init(params)
    params, opt_state = replicate_global(mesh, (params, opt_state))

    def train_step(params, opt_state, batch):
        def loss_fn(p):
            h = jnp.maximum(batch["point_clouds"] @ p["w1"], 0.0)
            pred = jnp.mean(h, axis=1) @ p["w2"]
            return jnp.mean((pred - batch["center_label"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # AOT-compile (process-local, no collectives), then re-align the ranks
    # so the step's first cross-host collective — which establishes the
    # gloo pair context under a short connect timeout — starts
    # near-simultaneously on both processes
    compiled = (
        jax.jit(train_step).lower(params, opt_state, sharded).compile()
    )
    barrier("dist_worker_compiled")
    for _ in range(3):
        params, opt_state, loss = compiled(params, opt_state, sharded)
    loss = float(loss)  # value materialization = completion
    pnorm = float(
        sum(jnp.sum(p * p) for p in jax.tree.leaves(params)) ** 0.5
    )
    assert np.isfinite(loss), loss
    print(f"DIST_OK rank={ctx.rank} loss={loss:.8f} pnorm={pnorm:.8f}", flush=True)

    # ---- tensor parallelism ACROSS the process boundary -----------------
    # (data, model) mesh transposed so the model axis pairs one device
    # from EACH process: the column-parallel w1 / row-parallel w2 matmul
    # chain forces GSPMD's TP all-reduce onto the cross-process gloo
    # channel. Identical losses prove the partial matmul products met
    # across hosts (each process only holds half of every kernel).
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()).reshape(2, 2).T  # model axis x-proc
    tp_mesh = Mesh(devs, ("data", "model"))
    w1 = rng.normal(size=(3, 32)).astype(np.float32) * 0.1
    w2 = rng.normal(size=(32, 3)).astype(np.float32) * 0.1
    w1 = jax.make_array_from_callback(
        w1.shape, NamedSharding(tp_mesh, P(None, "model")),
        lambda idx: w1[idx],
    )
    w2 = jax.make_array_from_callback(
        w2.shape, NamedSharding(tp_mesh, P("model", None)),
        lambda idx: w2[idx],
    )
    # With the transposed mesh each process's devices sit in DIFFERENT
    # data rows, so its addressable slice is non-contiguous; both
    # processes hold the identical full batch (same seed) and let
    # make_array_from_process_local_data carve out what they own.
    data_sh = NamedSharding(tp_mesh, P("data"))
    xs = {
        k: jax.make_array_from_process_local_data(
            data_sh, src, (global_bs,) + src.shape[1:]
        )
        for k, src in (("x", full["point_clouds"]),
                       ("y", full["center_label"]))
    }

    def tp_loss(w1, w2, b):
        h = jnp.maximum(b["x"] @ w1, 0.0)  # col-parallel
        pred = jnp.mean(h, axis=1) @ w2  # row-parallel -> all-reduce
        return jnp.mean((pred - b["y"]) ** 2)

    tp_step = jax.jit(jax.value_and_grad(tp_loss, argnums=(0, 1)))
    compiled_tp = tp_step.lower(w1, w2, xs).compile()
    barrier("dist_worker_tp_compiled")
    tl, (g1, g2) = compiled_tp(w1, w2, xs)
    tl = float(tl)
    gnorm = float(
        (jnp.sum(g1 * g1) + jnp.sum(g2 * g2)) ** 0.5
    )
    assert np.isfinite(tl) and np.isfinite(gnorm)
    print(f"DIST_TP_OK rank={ctx.rank} loss={tl:.8f} gnorm={gnorm:.8f}",
          flush=True)

    # ---- ZeRO-1 ACROSS the process boundary ------------------------------
    # Moment buffers shard 1/N over the GLOBAL data axis (each process
    # holds half of every large moment), placed via place_global — the
    # sharded-placement path device_put cannot do on non-addressable
    # shardings. out_shardings are pinned to the input layout, so the
    # optimizer-state layout is a fixed point of the step across hosts.
    from vlp3d.parallel.distributed import place_global
    from vlp3d.parallel.zero import opt_state_pspecs

    zparams = {
        "w1": rng.normal(size=(3, 8192)).astype(np.float32) * 0.1,
        "w2": rng.normal(size=(8192, 3)).astype(np.float32) * 0.1,
    }
    zopt = optimizer.init(zparams)
    ospecs = opt_state_pspecs(zopt, mesh.shape["data"], params=zparams)
    zparams = replicate_global(mesh, zparams)
    zopt = place_global(mesh, zopt, ospecs)
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(zopt)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    )
    assert n_sharded >= 4, n_sharded  # mu+nu of both kernels at least

    def z_step(params, opt_state, batch):
        def loss_fn(p):
            h = jnp.maximum(batch["point_clouds"] @ p["w1"], 0.0)
            pred = jnp.mean(h, axis=1) @ p["w2"]
            return jnp.mean((pred - batch["center_label"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    shard_of = lambda t: jax.tree.map(lambda x: x.sharding, t)  # noqa: E731
    zjit = jax.jit(
        z_step,
        out_shardings=(
            shard_of(zparams), shard_of(zopt),
            jax.sharding.NamedSharding(mesh, P()),
        ),
    )
    compiled_z = zjit.lower(zparams, zopt, sharded).compile()
    barrier("dist_worker_zero_compiled")
    in_specs = [s.spec for s in jax.tree.leaves(shard_of(zopt))]
    for _ in range(2):
        zparams, zopt, zloss = compiled_z(zparams, zopt, sharded)
    zloss = float(zloss)
    out_specs = [s.spec for s in jax.tree.leaves(shard_of(zopt))]
    assert in_specs == out_specs, "opt-state layout drifted across steps"
    n_still = sum(
        1 for leaf in jax.tree.leaves(zopt)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    )
    assert n_still == n_sharded, (n_still, n_sharded)
    assert np.isfinite(zloss), zloss
    print(
        f"DIST_ZERO_OK rank={ctx.rank} loss={zloss:.8f} zshards={n_sharded}",
        flush=True,
    )

    # ---- collective liveness decision (solver interrupt-save path) ------
    # all_processes_agree must AND a per-process bit across hosts: True
    # everywhere -> True, and a single dissenting rank -> False on EVERY
    # rank (the property the interrupt save relies on so no rank enters
    # the save's all-gather alone).
    from vlp3d.parallel.distributed import all_processes_agree

    agree_all = all_processes_agree(True)
    agree_split = all_processes_agree(ctx.rank == 0)  # rank 1 dissents
    assert agree_all is True and agree_split is False, (
        agree_all, agree_split)
    print(f"DIST_AGREE_OK rank={ctx.rank} all={int(agree_all)} "
          f"split={int(agree_split)}", flush=True)

    # ---- checkpoint materialization of the cross-host-sharded state -----
    # np.asarray raises on the non-addressable ZeRO moments; host_global
    # all-gathers them — this is the solver's _save_full_checkpoint path
    # for multi-host --zero1 runs.
    from vlp3d.parallel.distributed import host_global

    host_opt = host_global(zopt)
    gshapes = [tuple(x.shape) for x in jax.tree.leaves(zopt)
               if hasattr(x, "shape")]
    hshapes = [tuple(np.asarray(x).shape) for x in jax.tree.leaves(host_opt)
               if hasattr(x, "shape")]
    assert hshapes == gshapes, (hshapes, gshapes)
    hnorm = float(sum(
        float(np.sum(np.asarray(x, dtype=np.float64) ** 2))
        for x in jax.tree.leaves(host_opt)
        if hasattr(x, "shape") and np.issubdtype(
            np.asarray(x).dtype, np.floating)
    ) ** 0.5)
    assert np.isfinite(hnorm)
    print(f"DIST_HOSTGLOBAL_OK rank={ctx.rank} onorm={hnorm:.8f}",
          flush=True)


if __name__ == "__main__":
    main()
