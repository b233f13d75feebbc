"""ScanQA VQA training entry (scripts/joint_scripts/train_qa.py):
JointNet with use_answer=True over ScanQA question annotations.

Mirrors the reference contract: the answer vocabulary is built from the
training answers (Counter.most_common() capped at --answer_max_size,
filtered by --answer_min_freq, sorted keys — train_qa.py:32-45), the model
runs with no_caption=True (train_qa.py:106-127), and best-model selection
keys on answer_acc@1 (lib/vqa/solver.py:120,503-506).

Usage:
  python -m vlp3d.cli.train_qa --synthetic --smoke      # CI smoke
  python -m vlp3d.cli.train_qa --scanqa_dir ... --scannet_data ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def build_qa_datasets(args, config):
    """(train_ds, val_ds) of ScanQADataset emitting joint-format batches
    plus answer_cat/answer_cats/answer_cat_scores."""
    from vlp3d.data.vqa_dataset import ScanQADataset, build_answer_vocab

    if args.synthetic:
        from vlp3d.cli.train_scanqa import _synthetic_qa
        from vlp3d.data.tokenizer import HashTokenizer

        qa_train, source, _ = _synthetic_qa(config)
        qa_val = qa_train
        tokenizer = HashTokenizer()
        raw2label = {}
    else:
        from vlp3d.data.dataset import (
            DirectorySceneSource,
            load_raw2label,
            load_tokenizer,
        )

        with open(os.path.join(
                args.scanqa_dir, f"{args.project}_train.json")) as f:
            qa_train = json.load(f)
        with open(os.path.join(
                args.scanqa_dir, f"{args.project}_val.json")) as f:
            qa_val = json.load(f)
        source = DirectorySceneSource(
            args.scannet_data, multiview_hdf5=args.multiview_hdf5 or None
        )
        tokenizer = load_tokenizer(args.bert_vocab or None)
        raw2label = load_raw2label(args.labels_tsv) if args.labels_tsv else {}

    vocab, counter = build_answer_vocab(
        qa_train,
        min_count=args.answer_min_freq,
        max_size=args.answer_max_size,
    )
    common = dict(
        answer_vocab=vocab,
        answer_counter=counter,
        num_answers=max(len(vocab), 1),
        num_points=config.dataset.num_points,
        lang_num_max=config.model.lang_num_max,
        bert_max_len=config.model.bert_seq_len,
        mean_size_arr=config.dataset.mean_size_arr(),
        raw2label=raw2label,
        seed=args.seed,
    )
    train_ds = ScanQADataset(
        qa_train, source, tokenizer, split="train",
        augment=not getattr(args, "no_augment", False), shuffle=True,
        **common,
    )
    val_ds = ScanQADataset(
        qa_val, source, tokenizer, split="val", augment=False, **common
    )
    return train_ds, val_ds


def main(argv=None):
    from vlp3d.cli.common import add_common_args, resolve_config

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--scanqa_dir", type=str, default="data/scanqa")
    p.add_argument("--project", type=str, default="ScanQA_v1.0")
    p.add_argument("--answer_max_size", type=int, default=-1)
    p.add_argument("--answer_min_freq", type=int, default=1)
    # reference VQA recipe: MultiStepLR([100, 200], gamma 0.2)
    # (scripts/joint_scripts/train_qa.py:446-449 + lib/vqa/solver.py:210)
    p.add_argument("--lr_decay_step", nargs="+", type=int,
                   default=[100, 200])
    p.add_argument("--lr_decay_rate", type=float, default=0.2)
    p.add_argument("--max_grad_norm", type=float, default=1.0,
                   help="clip_grad_value_ bound (the reference arg name; "
                        "it clips VALUES, lib/vqa/solver.py:336-339)")
    # VQA defaults differ from the joint path's
    # (scripts/joint_scripts/train_qa.py:435-437: lr 5e-4, wd 1e-5)
    p.set_defaults(lr=5e-4, wd=1e-5)
    args = p.parse_args(argv)
    args.use_answer = True
    args.no_caption = True  # reference get_model: no_caption=True
    if not any(a.startswith("--criterion") for a in (argv or [])):
        args.criterion = "answer_acc_at1"

    from vlp3d.parallel.distributed import dist_init

    ctx = dist_init()
    if ctx.distributed:
        print(
            f"| distributed init (rank {ctx.rank}/{ctx.world_size}): "
            f"{ctx.coordinator}",
            flush=True,
        )

    config = resolve_config(args)
    train_ds, val_ds = build_qa_datasets(args, config)
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(
            config.model,
            num_answers=train_ds.num_answers,
            use_answer=True,
            no_caption=True,
        ),
        train=dataclasses.replace(
            config.train,
            # the full VQA recipe (scripts/joint_scripts/train_qa.py +
            # lib/vqa/solver.py): plain Adam (coupled L2) over ONE param
            # group, MultiStepLR regardless of --coslr (parsed, unused),
            # and clip_grad_value_(1.0)
            lr_schedule="step",
            lr_decay_steps=tuple(args.lr_decay_step),
            lr_decay_rate=args.lr_decay_rate,
            optim_name="adam",
            single_lr_group=True,
            clip_grad_value=args.max_grad_norm,
        ),
    )

    from vlp3d.cli.common import resolve_workdir, resume_solver

    workdir = resolve_workdir(args)
    with open(os.path.join(workdir, "info.json"), "w") as f:
        json.dump(
            {"args": vars(args), "num_answers": train_ds.num_answers},
            f, indent=2,
        )

    from vlp3d.data.dataset import BatchIterator
    from vlp3d.train.solver import Solver

    solver = Solver(
        config,
        train_ds,
        val_ds,
        workdir,
        caption=False,
        detection=not getattr(args, "no_detection", False),
        reference=not config.model.no_reference,
        use_bn_schedule=True,
        log_every=getattr(args, "verbose", 10),
        criterion=args.criterion,
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
        # warm start from the grounding/caption stage (train_qa.py:129-134)
        n_restored, n_skipped = solver.warm_start(args.pretrain)
        print(
            f"warm-started from {args.pretrain}: {n_restored} leaves "
            f"restored, {n_skipped} fresh"
        )

    start_epoch = resume_solver(solver, args, workdir)

    best = solver(config.train.epochs, start_epoch=start_epoch)
    print(json.dumps({k: v for k, v in best.items()}, default=float))
    return best


if __name__ == "__main__":
    main()
