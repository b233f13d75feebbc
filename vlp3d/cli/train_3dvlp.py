"""Joint 3DVLP training entry point.

Mirrors `scripts/joint_scripts/train_3dvlp.py` (the run.sh canonical
command: --use_multiview --use_normal --batch_size 8 --epoch 200
--lang_num_max 8 --coslr --lr 0.002 --no_caption --unfreeze 6 --use_con
--use_diou_loss).

Usage:
  python -m vlp3d.cli.train_3dvlp --synthetic --smoke   # CI smoke
  python -m vlp3d.cli.train_3dvlp --scanrefer_dir ... --scannet_data ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def main(argv=None):
    from vlp3d.cli.common import add_common_args, build_datasets, resolve_config

    p = argparse.ArgumentParser()
    add_common_args(p)
    args = p.parse_args(argv)

    # multi-host rendezvous (env:// or SLURM, utils/dist.py contract);
    # no-op single-process. Must run before any backend touch.
    from vlp3d.parallel.distributed import dist_init

    ctx = dist_init()
    if ctx.distributed:
        print(
            f"| distributed init (rank {ctx.rank}/{ctx.world_size}): "
            f"{ctx.coordinator}",
            flush=True,
        )

    config = resolve_config(args)

    train_ds, val_ds = build_datasets(args, config)

    from vlp3d.cli.common import resolve_workdir, resume_solver

    workdir = resolve_workdir(args)
    with open(os.path.join(workdir, "info.json"), "w") as f:
        json.dump({"args": vars(args)}, f, indent=2)

    from vlp3d.data.dataset import BatchIterator
    from vlp3d.train.solver import Solver

    solver = Solver(
        config,
        train_ds,
        val_ds,
        workdir,
        caption=not config.model.no_caption,
        detection=not getattr(args, "no_detection", False),
        reference=not config.model.no_reference,
        use_bn_schedule=config.model.no_caption,
        log_every=getattr(args, "verbose", 10),
        criterion=getattr(args, "criterion", "sum"),
        val_step=getattr(args, "val_step", 2000),
        tp=getattr(args, "tp", 1),
        zero1=getattr(args, "zero1", False),
        grad_accum=getattr(args, "grad_accum", 1),
        donate=not getattr(args, "no_donate", False),
        seed=args.seed,
        use_wandb=getattr(args, "use_wandb", False),
        profile_dir=getattr(args, "profile_dir", "") or None,
    )
    sample = next(iter(BatchIterator(train_ds, config.train.batch_size)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)

    if args.pretrain:
        # strict=False warm start from a previous stage's snapshot — the
        # staged grounding -> caption -> QA recipe (train_3dvlp.py:115-121,
        # train_caption.py:110-115)
        n_restored, n_skipped = solver.warm_start(args.pretrain)
        print(
            f"warm-started from {args.pretrain}: {n_restored} leaves "
            f"restored, {n_skipped} fresh"
        )

    # --auto_resume: a stable --workdir + rerunning the same command is
    # the whole preemption-recovery story (SIGTERM -> save-and-exit ->
    # restart -> continue); a first run falls through to a fresh start
    start_epoch = resume_solver(solver, args, workdir)

    best = solver(config.train.epochs, start_epoch=start_epoch)
    print(json.dumps({k: v for k, v in best.items()}, default=float))
    return best


if __name__ == "__main__":
    main()
