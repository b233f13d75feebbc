"""Standalone ScanQA training (the reference's non-joint VQA pipeline:
`scripts/vqa_scripts/train.py` + `lib/vqa/solver.py`).

Trains the MCAN-based ScanQA model (GloVe + LSTM language encoder,
PointNet++ detection, MCAN fusion, answer head — `models/vqa/qa_module.py`)
with `compute_vqa_loss` (lib/vqa/loss_helper.py:268-357) and reports
answer EM@1/EM@10 per epoch (lib/vqa/solver.py:366-390), keeping the best
model by EM@1.

One question per item (the reference's VQA dataset is unchunked), so the
ScanQADataset runs with lang_num_max=1 and the L axis is squeezed.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--scanqa_dir", type=str, default="data/scanqa")
    p.add_argument("--scannet_data", type=str, default="data/scannet_data")
    p.add_argument("--glove_pickle", type=str, default="")
    p.add_argument("--labels_tsv", type=str, default="")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epoch", type=int, default=50)
    # reference default (scripts/vqa_scripts/train.py:44)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--lr_decay_step", nargs="+", type=int,
                   default=[100, 200])
    p.add_argument("--lr_decay_rate", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--val_step", type=int, default=1)
    p.add_argument("--smoke", action="store_true",
                   help="tiny synthetic end-to-end run (no assets)")
    p.add_argument("--synthetic", action="store_true")
    return p


def _synthetic_qa(config, n_scenes=2, questions_per_scene=4):
    """Synthetic scenes + QA annotations + GloVe dict (no assets)."""
    from vlp3d.data.dataset import InMemorySceneSource
    from vlp3d.data.glove import synthetic_glove
    from vlp3d.data.synthetic import make_synthetic_dataset

    base = make_synthetic_dataset(
        config, n_scenes=n_scenes, n_points=config.dataset.num_points
    )
    scenes = base.scene_source.scenes
    words = ["what", "color", "is", "the", "chair", "table", "bed",
             "sofa", "where", "near", "many", "how"]
    qa = []
    for sid in scenes:
        for q in range(questions_per_scene):
            name = words[4 + q % 4]
            qa.append(
                {
                    "scene_id": sid,
                    "question_id": f"{sid}-{q}",
                    "question": f"what color is the {name} near the wall",
                    "object_ids": [10 + q % 4],
                    "object_names": [name],
                    "answers": [["red", "blue", "two", "wood"][q % 4]],
                }
            )
    glove = synthetic_glove(words + ["unk", "pad"])
    return qa, InMemorySceneSource(scenes), glove


def _squeeze_l(batch: dict) -> dict:
    """Drop the lang_num_max=1 chunk axis and map the *_list ref labels to
    the per-question keys the standalone model/loss consume."""
    out = dict(batch)
    for k in ("lang_feat", "lang_len", "main_lang_feat", "main_lang_len",
              "first_obj", "answer_cat", "answer_cats", "answer_cat_scores"):
        if k in out:
            out[k] = out[k][:, 0]
    renames = {
        "ref_center_label_list": "ref_center_label",
        "ref_size_class_label_list": "ref_size_class_label",
        "ref_size_residual_label_list": "ref_size_residual_label",
        "ref_box_label_list": "ref_box_label",
        "object_cat_list": "object_cat",
    }
    for src, dst in renames.items():
        if src in out:
            out[dst] = out[src][:, 0]
    return out


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.synthetic import tiny_config
    from vlp3d.data.tokenizer import HashTokenizer, load_tokenizer
    from vlp3d.data.vqa_dataset import ScanQADataset
    from vlp3d.eval.vqa import answer_accuracy
    from vlp3d.losses.vqa import compute_vqa_loss
    from vlp3d.models.scanqa import ScanQA
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    if args.smoke:
        config = tiny_config()
        args.synthetic = True
        args.batch_size = min(args.batch_size, 2)
        args.epoch = min(args.epoch, 2)
    else:
        config = Config(dataset=DatasetConfig(num_points=args.num_points),
                        model=ModelConfig())

    stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
    if args.tag:
        stamp += "_" + args.tag.upper()
    workdir = os.path.join(args.output_dir, stamp)
    os.makedirs(workdir, exist_ok=True)

    if args.synthetic:
        qa, source, glove = _synthetic_qa(config)
        qa_train, qa_val = qa, qa
        tokenizer = HashTokenizer()
        raw2label = {}
    else:
        from vlp3d.data.dataset import DirectorySceneSource, load_raw2label
        from vlp3d.data.glove import load_glove

        with open(os.path.join(
                args.scanqa_dir, "ScanQA_v1.0_train.json")) as f:
            qa_train = json.load(f)
        with open(os.path.join(
                args.scanqa_dir, "ScanQA_v1.0_val.json")) as f:
            qa_val = json.load(f)
        source = DirectorySceneSource(args.scannet_data)
        glove = load_glove(args.glove_pickle)
        tokenizer = load_tokenizer("")
        raw2label = load_raw2label(args.labels_tsv) if args.labels_tsv else {}

    common = dict(
        num_points=config.dataset.num_points,
        lang_num_max=1,
        bert_max_len=config.model.bert_seq_len,
        mean_size_arr=config.dataset.mean_size_arr(),
        glove=glove,
        raw2label=raw2label,
    )
    train_ds = ScanQADataset(qa_train, source, tokenizer, split="train",
                             **common)
    val_ds = ScanQADataset(
        qa_val, source, tokenizer, split="val",
        answer_vocab=train_ds.answer_vocab,
        answer_counter=train_ds.answer_counter,
        num_answers=train_ds.num_answers, **common,
    )

    model = ScanQA(config, num_answers=train_ds.num_answers)
    rng = np.random.default_rng(args.seed)
    first = _squeeze_l(
        next(iter(BatchIterator(train_ds, args.batch_size,
                                rng=np.random.default_rng(0))))
    )
    first = {k: v for k, v in first.items() if not isinstance(v, list)}
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(args.seed)}, b,
                             train=False)
    )(first)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # reference standalone recipe: MultiStepLR([100, 200], gamma 0.2)
    # (scripts/vqa_scripts/train.py:49-50 + lib/vqa/solver.py:210-216),
    # stepped per epoch
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    milestones = tuple(getattr(args, "lr_decay_step", (100, 200)))
    rate = getattr(args, "lr_decay_rate", 0.2)

    def _lr(step):
        e = step // steps_per_epoch
        k = sum((e >= m).astype(jnp.int32) if hasattr(e, "dtype")
                else int(e >= m) for m in milestones)
        return args.lr * (rate ** k)

    # plain Adam with COUPLED L2 (optim.Adam, the reference default) +
    # clip_grad_value_(1.0) (lib/vqa/solver.py:336-339)
    tx = optax.chain(
        optax.clip(1.0),
        optax.add_decayed_weights(args.wd),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(_lr),
    )
    opt_state = tx.init(params)
    mean_size = jnp.asarray(config.dataset.mean_size_arr())

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, step_rng):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            loss, metrics = compute_vqa_loss(out, batch, mean_size)
            scalars = {k: v for k, v in metrics.items()
                       if jnp.ndim(v) == 0}
            return loss, (scalars, updates.get("batch_stats", {}),
                          out["answer_scores"])

        grads, (metrics, new_stats, scores) = jax.grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, new_stats, opt_state2, metrics, scores

    @jax.jit
    def eval_step(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False,
        )
        return out["answer_scores"]

    logf = open(os.path.join(workdir, "log.jsonl"), "a")
    jrng = jax.random.key(args.seed)
    best = {"epoch": 0, "answer_acc_1": -1.0, "answer_acc_10": -1.0}
    for epoch in range(args.epoch):
        train_ds.shuffle_data()
        metrics = {}
        for batch in BatchIterator(train_ds, args.batch_size, epoch=epoch,
                                   num_workers=args.num_workers,
                                   rng=rng):
            batch = _squeeze_l(
                {k: v for k, v in batch.items() if not isinstance(v, list)}
            )
            jrng, step_rng = jax.random.split(jrng)
            params, batch_stats, opt_state, metrics, _ = train_step(
                params, batch_stats, opt_state, batch, step_rng
            )
        logf.write(json.dumps(
            {"phase": "train", "epoch": epoch,
             **{k: float(v) for k, v in metrics.items()}}) + "\n")

        if (epoch + 1) % args.val_step == 0:
            acc1s, acc10s = [], []
            for batch in BatchIterator(val_ds, args.batch_size,
                                       drop_last=False,
                                       num_workers=args.num_workers,
                                       rng=np.random.default_rng(0)):
                batch = _squeeze_l(
                    {k: v for k, v in batch.items()
                     if not isinstance(v, list)}
                )
                scores = eval_step(params, batch_stats, batch)
                a1, a10 = answer_accuracy(
                    scores, jnp.asarray(batch["answer_cats"]),
                    topk=min(10, train_ds.num_answers),
                )
                acc1s.append(float(a1))
                acc10s.append(float(a10))
            acc1, acc10 = float(np.mean(acc1s)), float(np.mean(acc10s))
            logf.write(json.dumps(
                {"phase": "val", "epoch": epoch, "answer_acc_1": acc1,
                 "answer_acc_10": acc10}) + "\n")
            logf.flush()
            print(f"epoch {epoch}: EM@1 {acc1:.4f} EM@10 {acc10:.4f}")
            if acc1 > best["answer_acc_1"]:
                best = {"epoch": epoch, "answer_acc_1": acc1,
                        "answer_acc_10": acc10}
                ckpt.save_params(workdir, "model", params, batch_stats)
    ckpt.save_params(workdir, "model_last", params, batch_stats)
    # join the async orbax commit before returning: callers
    # (and the reference's torch.save contract) expect the
    # snapshot on disk when training exits
    ckpt.wait_until_finished()
    with open(os.path.join(workdir, "best.json"), "w") as f:
        json.dump(best, f)
    print("best:", best)
    return best


if __name__ == "__main__":
    main()
