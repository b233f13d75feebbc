"""Legacy single-task grounding training — RefNet + GloVe/LSTM language.

The reference's 3DJCG-era pipeline (`scripts/grounding_scripts/
train_3djcg_g.py` + `lib/visual_grounding/solver_3djcg_g.py`; broken as
checked out upstream — the imports reference nonexistent modules, SURVEY
§2.8 — so this mirrors the CONTRACT): backbone/vote/proposal/relation/
match without BERT or contrastive heads, GloVe-embedded descriptions
through an LSTM encoder, scored by the joint detection+reference loss and
grounding Acc@0.25/0.5, best model kept by iou_rate_0.5.
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
    p.add_argument("--scanrefer_dir", type=str, default="data/scanrefer")
    p.add_argument("--scannet_data", type=str, default="data/scannet_data")
    p.add_argument("--glove_pickle", type=str, default="")
    p.add_argument("--labels_tsv", type=str, default="")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epoch", type=int, default=100)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--wd", type=float, default=1e-3)
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--lang_num_max", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--val_step", type=int, default=1)
    p.add_argument("--use_diou_loss", action="store_true", default=True)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    return p


def main(argv=None):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.synthetic import tiny_config
    from vlp3d.eval.grounding import get_eval
    from vlp3d.losses.joint import compute_joint_loss
    from vlp3d.models.refnet import RefNet
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
        config = Config(
            dataset=DatasetConfig(num_points=args.num_points),
            model=ModelConfig(
                lang_num_max=args.lang_num_max, no_caption=True,
                use_con=False, use_mlm=False,
            ),
        )
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(
            config.model, no_caption=True, use_con=False, use_mlm=False
        ),
    )

    stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
    if args.tag:
        stamp += "_" + args.tag.upper()
    workdir = os.path.join(args.output_dir, stamp)
    os.makedirs(workdir, exist_ok=True)

    if args.synthetic:
        from vlp3d.data.glove import synthetic_glove
        from vlp3d.data.synthetic import make_synthetic_dataset

        words = ["the", "chair", "table", "bed", "sofa", "near", "wall"]
        glove = synthetic_glove(words + ["unk", "pad"])
        train_ds = make_synthetic_dataset(
            config, n_scenes=2, n_points=config.dataset.num_points,
            glove=glove,
        )
        val_ds = make_synthetic_dataset(
            config, n_scenes=2, n_points=config.dataset.num_points,
            split="val", glove=glove,
        )
    else:
        from vlp3d.cli.common import load_scanrefer
        from vlp3d.data.dataset import (
            DirectorySceneSource,
            ScanReferJointDataset,
            load_raw2label,
        )
        from vlp3d.data.glove import load_glove
        from vlp3d.data.tokenizer import load_tokenizer

        glove = load_glove(args.glove_pickle)
        raw2label = load_raw2label(args.labels_tsv) if args.labels_tsv else {}
        source = DirectorySceneSource(args.scannet_data)
        tok = load_tokenizer("")
        common = dict(
            num_points=config.dataset.num_points,
            lang_num_max=config.model.lang_num_max,
            mean_size_arr=config.dataset.mean_size_arr(),
            glove=glove, raw2label=raw2label,
        )
        train_ds = ScanReferJointDataset(
            load_scanrefer(args.scanrefer_dir, "train"), source, tok,
            split="train", augment=True, **common,
        )
        val_ds = ScanReferJointDataset(
            load_scanrefer(args.scanrefer_dir, "val"), source, tok,
            split="val", **common,
        )

    model = RefNet(config)
    rng = np.random.default_rng(args.seed)
    first = next(iter(BatchIterator(train_ds, args.batch_size,
                                    rng=np.random.default_rng(0))))
    first = {k: v for k, v in first.items() if not isinstance(v, list)}
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(args.seed)}, b,
                             train=False)
    )(first)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adamw(args.lr, weight_decay=args.wd)
    opt_state = tx.init(params)
    mean_size = config.dataset.mean_size_arr()

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, step_rng):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            loss, metrics = compute_joint_loss(config, out, batch)
            scalars = {k: v for k, v in metrics.items()
                       if jnp.ndim(v) == 0}
            return loss, (scalars, updates.get("batch_stats", {}))

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats,
                opt_state2, metrics)

    @jax.jit
    def eval_step(params, batch_stats, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False,
        )

    logf = open(os.path.join(workdir, "log.jsonl"), "a")
    jrng = jax.random.key(args.seed)
    best = {"epoch": 0, "iou_rate_0.25": -1.0, "iou_rate_0.5": -1.0}
    for epoch in range(args.epoch):
        train_ds.shuffle_data()
        metrics = {}
        for batch in BatchIterator(train_ds, args.batch_size, epoch=epoch,
                                   num_workers=args.num_workers,
                                   rng=rng):
            batch = {k: v for k, v in batch.items()
                     if not isinstance(v, list)}
            jrng, step_rng = jax.random.split(jrng)
            params, batch_stats, opt_state, metrics = train_step(
                params, batch_stats, opt_state, batch, step_rng
            )
        logf.write(json.dumps(
            {"phase": "train", "epoch": epoch,
             **{k: float(v) for k, v in metrics.items()}}) + "\n")

        if (epoch + 1) % args.val_step == 0:
            ious = []
            for batch in BatchIterator(val_ds, args.batch_size,
                                       drop_last=False,
                                       num_workers=args.num_workers,
                                       rng=np.random.default_rng(0)):
                batch = {k: v for k, v in batch.items()
                         if not isinstance(v, list)}
                out = eval_step(params, batch_stats, batch)
                g = get_eval(
                    {k: np.asarray(v) for k, v in out.items()
                     if not isinstance(v, (list, dict))},
                    {k: np.asarray(v) for k, v in batch.items()},
                    mean_size_arr=mean_size,
                    use_lang_classifier=config.model.use_lang_classifier,
                )
                ious += g["ref_iou"]
            ious_np = np.asarray(ious)
            r25 = float((ious_np >= 0.25).mean()) if len(ious) else 0.0
            r5 = float((ious_np >= 0.5).mean()) if len(ious) else 0.0
            logf.write(json.dumps(
                {"phase": "val", "epoch": epoch, "iou_rate_0.25": r25,
                 "iou_rate_0.5": r5}) + "\n")
            logf.flush()
            print(f"epoch {epoch}: Acc@0.25 {r25:.4f} Acc@0.5 {r5:.4f}")
            if r5 > best["iou_rate_0.5"]:
                best = {"epoch": epoch, "iou_rate_0.25": r25,
                        "iou_rate_0.5": r5}
                ckpt.save_params(workdir, "ground_model", params,
                                 batch_stats)
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
