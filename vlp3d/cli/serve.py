"""Online inference server.

The reference has no serving entry point (its predict() is an offline
pred.json dump, scripts/joint_scripts/train_3dvlp.py:423-538); this CLI
is the rebuild's production-serving addition: a JSON-over-HTTP endpoint
(vlp3d/serve.py) with fixed-shape micro-batching in front of the jitted
streaming predictors.

    vlp3d-serve --task ground --model_dir out/run1 --port 8080
    curl -s localhost:8080/healthz
    curl -s -X POST localhost:8080/v1/ground -d \\
      '{"point_cloud": [[...], ...], "queries": ["the brown chair"]}'

`--task` takes one task, a comma-separated subset, or `all`: multiple
tasks share one checkpoint's weights, each routed at /v1/<task> with its
own micro-batching queue. `--data_devices N` serves data-parallel over
an N-device mesh (0 = every local device; the serve batch shards over
the mesh, weights replicate). `--smoke` serves the tiny synthetic config
with random-init weights (no checkpoint needed) — a one-command way to
exercise the wire format.
"""

from __future__ import annotations

import argparse

TASKS = ("ground", "caption", "answer")


def parse_args(argv=None):
    """Parse CLI flags; returns (args, tasks)."""
    from vlp3d.cli.common import add_common_args

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--task", type=str, default="ground",
                   help="one of ground/caption/answer, a comma-separated "
                        "subset, or 'all' (tasks share the checkpoint)")
    p.add_argument("--model_dir", type=str, default="",
                   help="orbax snapshot dir (vlp3d-train output); "
                        "random init when empty (smoke only)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    # default 16: the measured throughput knee — 96% of the chip's
    # saturated grounding throughput at half of batch-32's latency
    # (PERF.md "batch-throughput curve"); occupancy-shaped executors
    # keep low-load latency at the occupancy-1 figure regardless
    p.add_argument("--serve_batch_size", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--data_devices", type=int, default=1,
                   help="serve data-parallel over N devices (0 = all); "
                        "serve_batch_size must be divisible by N")
    p.add_argument("--vocab_path", type=str, default="",
                   help="WordPiece vocab.txt (hash tokenizer when empty)")
    p.add_argument("--answer_vocab", type=str, default="",
                   help="answer-id -> text json list (answer task)")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the pre-bind compile warmup (first client "
                        "request pays the compile instead)")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="persistent XLA compilation cache dir (default: "
                        "the repo-level .jax_cache_tpu, or $VLP3D_JIT_CACHE)"
                        " — a warm restart of the same (checkpoint, shapes)"
                        " skips the warmup compile on a local TPU runtime; "
                        "pass 'off' to disable. On the tunneled axon relay "
                        "the default is off (warm loads measured slower "
                        "than the relay's own compile cache; PERF.md)")
    p.add_argument("--num_beams", type=int, default=1,
                   help="caption-task beam width (1 = greedy; >1 trades "
                        "~num_beams x decode cost for caption quality)")
    args = p.parse_args(argv)

    tasks = TASKS if args.task == "all" else tuple(
        t.strip() for t in args.task.split(",") if t.strip()
    )
    unknown = set(tasks) - set(TASKS)
    if unknown or not tasks:
        p.error(f"--task must be a subset of {'/'.join(TASKS)} or 'all'; "
                f"got {args.task!r}")
    return args, tasks


def build_server(args, tasks):
    """Build (without starting) the HTTP server + its task services —
    separated from main() so tests can drive the full startup path."""
    from vlp3d.cli.common import resolve_config

    import dataclasses
    import json

    import jax

    from vlp3d.data.synthetic import make_batch
    from vlp3d.data.tokenizer import load_tokenizer
    from vlp3d.models.jointnet import JointNet
    from vlp3d.serve import InferenceService, make_server
    from vlp3d.train import checkpoint as ckpt

    # persistent compile cache: the warmup compile (~minutes on TPU for
    # the canonical shapes) is paid once per (program, shapes) — a server
    # restart with the same flags warms from disk in seconds (measured
    # cold vs warm in PERF.md). An explicit --compile_cache_dir wins; an
    # already-configured jax cache (test conftest, embedding app) is kept.
    explicit = getattr(args, "compile_cache_dir", None)
    if explicit != "off":
        from vlp3d.utils.jitcache import enable_persistent_cache

        cache_dir = enable_persistent_cache(explicit or None)
        print(
            f"| vlp3d-serve: compile cache at {cache_dir}" if cache_dir
            else "| vlp3d-serve: compile cache off (axon relay: warm "
                 "executable loads measured slower than the relay's own "
                 "compile cache — PERF.md; pass --compile_cache_dir to "
                 "force)",
            flush=True,
        )

    config = resolve_config(args)
    # the served tasks decide which heads the model carries
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(
            config.model,
            use_answer=config.model.use_answer or "answer" in tasks,
            no_caption=config.model.no_caption and "caption" not in tasks,
        ),
    )

    mesh = None
    if args.data_devices != 1:
        from vlp3d.parallel.mesh import make_mesh

        n = args.data_devices
        if n and (n < 1 or n > len(jax.devices())):
            raise SystemExit(
                f"--data_devices {n} invalid: this host exposes "
                f"{len(jax.devices())} device(s)"
            )
        mesh = make_mesh(n or None)

    model = JointNet(config)
    sample = make_batch(
        config, batch_size=args.serve_batch_size,
        num_points=config.dataset.num_points,
    )
    # inference needs only params + batch_stats — a jitted model.init
    # gives the structure (and the random weights for checkpoint-less
    # smoke serving) without allocating optimizer moment buffers
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(config.train.seed)}, b, train=False
        )
    )(sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.model_dir:
        snap = ckpt.load_params(args.model_dir, "model")
        params = snap["params"]
        batch_stats = snap.get("batch_stats", batch_stats)
    variables = {"params": params, "batch_stats": batch_stats}

    answer_vocab = None
    if args.answer_vocab:
        with open(args.answer_vocab, encoding="utf-8") as f:
            answer_vocab = json.load(f)

    tokenizer = load_tokenizer(args.vocab_path or None)
    services = {
        task: InferenceService(
            config,
            variables,
            task=task,
            tokenizer=tokenizer,
            answer_vocab=answer_vocab,
            batch_size=args.serve_batch_size,
            max_wait_ms=args.max_wait_ms,
            mesh=mesh,
            num_beams=getattr(args, "num_beams", 1),
        )
        for task in tasks
    }
    if not getattr(args, "no_warmup", False):
        for task, svc in services.items():
            print(f"| vlp3d-serve: warming up /v1/{task} "
                  "(compiling device programs)...", flush=True)
            svc.warmup()
    server = make_server(services, host=args.host, port=args.port)
    routes = ", ".join(f"/v1/{t}" for t in tasks)
    print(
        f"| vlp3d-serve: {routes} on "
        f"http://{args.host}:{server.server_address[1]} "
        f"(batch {args.serve_batch_size}, "
        f"{mesh.size if mesh is not None else 1} device(s))",
        flush=True,
    )
    return server, services


def main(argv=None):
    import signal
    import threading

    args, tasks = parse_args(argv)
    server, services = build_server(args, tasks)
    # SIGTERM (the fleet-manager stop signal) drains gracefully; the
    # handler runs on the thread inside serve_forever, so shutdown()
    # must be called from another thread to avoid self-deadlock
    signal.signal(
        signal.SIGTERM,
        lambda *_: threading.Thread(
            target=server.shutdown, daemon=True
        ).start(),
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        for s in services.values():
            s.close()


if __name__ == "__main__":
    main()
