"""Legacy single-task captioning training — CapNet top-down captioner.

The reference's 3DJCG/Scan2Cap-era pipeline
(`scripts/captioning_scripts/train_3djcg_c.py` +
`lib/visual_captioning/solver_3djcg_c.py`; broken as checked out upstream
— stale imports, SURVEY §2.8 — so this mirrors the CONTRACT): detection
stack + relation + GRU-style top-down captioner over GloVe word
embeddings, trained with detection losses + caption CE against the
caption vocabulary, best model kept by val cap_acc. Full Scan2Cap
metric evaluation (CIDEr/BLEU-4@0.5IoU) lives in the joint pipeline's
caption eval (vlp3d/train/solver.py caption_eval).
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
    p.add_argument("--vocab_json", type=str, default="")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epoch", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--num_points", type=int, default=40000)
    p.add_argument("--lang_num_max", type=int, default=8)
    p.add_argument("--max_des_len", type=int, default=30)
    p.add_argument("--num_locals", type=int, default=-1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--val_step", type=int, default=1)
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
    from vlp3d.data.vocab import build_caption_vocabulary
    from vlp3d.losses.captioning import compute_cap_loss
    from vlp3d.losses.joint import compute_joint_loss
    from vlp3d.models.capnet import CapNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.utils.jitcache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    if args.smoke:
        config = tiny_config()
        args.synthetic = True
        args.batch_size = min(args.batch_size, 2)
        args.epoch = min(args.epoch, 2)
        args.max_des_len = 10
    else:
        config = Config(
            dataset=DatasetConfig(num_points=args.num_points),
            model=ModelConfig(lang_num_max=args.lang_num_max),
        )
    config = dataclasses.replace(
        config,
        model=dataclasses.replace(
            config.model, no_caption=True, use_con=False, use_mlm=False,
            no_reference=True,
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
        glove = synthetic_glove(words + ["unk", "pad", "sos", "eos"])
        anns_probe = make_synthetic_dataset(config, n_scenes=1).scanrefer
        vocab = build_caption_vocabulary(
            anns_probe, max_des_len=args.max_des_len
        )
        mk = dict(
            n_scenes=2, n_points=config.dataset.num_points, glove=glove,
            caption_vocab=vocab, max_des_len=args.max_des_len,
        )
        train_ds = make_synthetic_dataset(config, **mk)
        val_ds = make_synthetic_dataset(config, split="val", **mk)
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
        anns_train = load_scanrefer(args.scanrefer_dir, "train")
        vocab = build_caption_vocabulary(
            anns_train, max_des_len=args.max_des_len,
            known_words=set(glove), vocab_path=args.vocab_json or None,
        )
        source = DirectorySceneSource(args.scannet_data)
        tok = load_tokenizer("")
        common = dict(
            num_points=config.dataset.num_points,
            lang_num_max=config.model.lang_num_max,
            mean_size_arr=config.dataset.mean_size_arr(),
            glove=glove, raw2label=raw2label, caption_vocab=vocab,
            max_des_len=args.max_des_len,
        )
        train_ds = ScanReferJointDataset(
            anns_train, source, tok, split="train", augment=True, **common
        )
        val_ds = ScanReferJointDataset(
            load_scanrefer(args.scanrefer_dir, "val"), source, tok,
            split="val", **common,
        )

    vocab_size = len(vocab["word2idx"])
    model = CapNet(config, vocab_size=vocab_size,
                   num_locals=args.num_locals)
    rng = np.random.default_rng(args.seed)

    def prep(batch):
        b = {k: v for k, v in batch.items() if not isinstance(v, list)}
        # the captioner teacher-forces on the sos/eos-wrapped embeddings
        b["lang_feat"] = b["cap_lang_feat"]
        return b

    first = prep(next(iter(BatchIterator(train_ds, args.batch_size,
                                         rng=np.random.default_rng(0)))))
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(args.seed)}, b,
                             train=False)
    )(first)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adamw(args.lr, weight_decay=args.wd)
    opt_state = tx.init(params)

    def losses(out, batch):
        det_loss, metrics = compute_joint_loss(
            config, out, batch, reference=False
        )
        cap_loss, cap_acc = compute_cap_loss(
            out["lang_cap"], jnp.asarray(batch["lang_ids"]),
            out["good_bbox_masks"],
        )
        metrics = {k: v for k, v in metrics.items() if jnp.ndim(v) == 0}
        metrics.update(cap_loss=cap_loss, cap_acc=cap_acc)
        total = det_loss + cap_loss
        metrics["loss"] = total
        return total, metrics

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, step_rng):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": step_rng},
            )
            total, metrics = losses(out, batch)
            return total, (metrics, updates.get("batch_stats", {}))

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats,
                opt_state2, metrics)

    @jax.jit
    def eval_step(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch,
            train=False,
        )
        return losses(out, batch)[1]

    logf = open(os.path.join(workdir, "log.jsonl"), "a")
    jrng = jax.random.key(args.seed)
    best = {"epoch": 0, "cap_acc": -1.0}
    for epoch in range(args.epoch):
        train_ds.shuffle_data()
        metrics = {}
        for batch in BatchIterator(train_ds, args.batch_size, epoch=epoch,
                                   num_workers=args.num_workers,
                                   rng=rng):
            jrng, step_rng = jax.random.split(jrng)
            params, batch_stats, opt_state, metrics = train_step(
                params, batch_stats, opt_state, prep(batch), step_rng
            )
        logf.write(json.dumps(
            {"phase": "train", "epoch": epoch,
             **{k: float(v) for k, v in metrics.items()}}) + "\n")

        if (epoch + 1) % args.val_step == 0:
            accs, cls = [], []
            for batch in BatchIterator(val_ds, args.batch_size,
                                       drop_last=False,
                                       num_workers=args.num_workers,
                                       rng=np.random.default_rng(0)):
                m = eval_step(params, batch_stats, prep(batch))
                accs.append(float(m["cap_acc"]))
                cls.append(float(m["cap_loss"]))
            acc = float(np.mean(accs)) if accs else 0.0
            cl = float(np.mean(cls)) if cls else 0.0
            logf.write(json.dumps(
                {"phase": "val", "epoch": epoch, "cap_acc": acc,
                 "cap_loss": cl}) + "\n")
            logf.flush()
            print(f"epoch {epoch}: cap_acc {acc:.4f} cap_loss {cl:.4f}")
            if acc > best["cap_acc"]:
                best = {"epoch": epoch, "cap_acc": acc, "cap_loss": cl}
                ckpt.save_params(workdir, "caption_model", params,
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
