"""Standalone Scan2Cap metric evaluation of a trained model.

Mirrors `scripts/joint_scripts/caption_eval.py`: load a snapshot, run the
caption pipeline over the val split (greedy decode per proposal, NMS +
IoU>=0.5 gate against assigned GT boxes), and report
BLEU-4 / CIDEr / ROUGE-L / METEOR @0.5 (eval_cap,
lib/joint/eval_helper.py:278-357).

Usage:
  python -m vlp3d.cli.caption_eval --smoke --synthetic
  python -m vlp3d.cli.caption_eval --scanrefer_dir ... --scannet_data ... \
      --model_dir outputs/<run>
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlp3d.cli.common import (
        add_common_args,
        build_datasets,
        load_scanrefer,
        resolve_config,
    )
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.tokenizer import load_tokenizer
    from vlp3d.eval.captioning import (
        collect_caption_candidates,
        organize_scanrefer,
        prepare_corpus,
        score_captions,
    )
    from vlp3d.losses.detection import compute_objectness_loss
    from vlp3d.models.caption import CaptionDecoder, beam_decode, greedy_decode
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--snapshot", type=str, default="model",
                   help="snapshot name inside model_dir (model / "
                        "caption_model / model_last)")
    p.add_argument("--out", type=str, default="",
                   help="optional json dump of the metric dict")
    p.add_argument("--num_beams", type=int, default=1,
                   help="beam width for caption decode (1 = greedy, the "
                        "reference's effective setting; the reference's "
                        "dormant num_beams knob, caption_module.py:261)")
    p.add_argument("--length_penalty", type=float, default=1.0,
                   help="beam-search length normalization exponent")
    args = p.parse_args(argv)
    args.no_caption = False

    config = resolve_config(args)
    _, val_ds = build_datasets(args, config)
    tokenizer = load_tokenizer(args.bert_vocab or None)

    # corpus + organized GT from the val annotations (eval_helper.py:24-44)
    if args.synthetic:
        anns = [
            {
                "scene_id": s,
                "object_id": str(o),
                "object_name": "chair",
                "ann_id": str(a),
                "token": ["a", "chair"],
            }
            for s in ("scene0000_00", "scene0001_00")
            for o in range(2)
            for a in range(2)
        ]
    else:
        anns = load_scanrefer(args.scanrefer_dir, "val")
    corpus = prepare_corpus(anns, config.model.max_des_len)
    organized = organize_scanrefer(anns)

    model = JointNet(config)
    sample = next(iter(BatchIterator(val_ds, config.train.batch_size,
                                     drop_last=False)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    optimizer = make_optimizer()
    state = create_state(model, optimizer, sample, config.train.seed)
    if args.model_dir:
        snap = ckpt.load_params(args.model_dir, args.snapshot)
        state = state.replace(
            params=snap["params"],
            batch_stats=snap.get("batch_stats", state.batch_stats),
        )

    decoder = CaptionDecoder(
        vocab_size=config.model.vocab_size,
        max_len=config.model.max_des_len + 2,
    )
    cap_vars = {"params": state.params["caption"]}

    # jitted: eager nn_distance dispatches hundreds of tiny ops, each a
    # ~30 ms round trip over the axon tunnel
    @jax.jit
    def assign_objects(xyz, scores, centers):
        return compute_objectness_loss(xyz, scores, centers)[3]

    @jax.jit
    def infer(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=False,
        )
        return {
            k: out[k]
            for k in (
                "aggregated_vote_features", "aggregated_vote_xyz",
                "objectness_scores", "sem_cls_scores", "pred_center",
                "pred_size", "pred_heading",
            )
        }

    candidates: dict = {}
    loader = BatchIterator(val_ds, config.train.batch_size, drop_last=False,
                           num_workers=config.train.num_workers)
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(infer(state.params, state.batch_stats, arrays))
        feats = out["aggregated_vote_features"]
        b, k, c = feats.shape
        obj_token = feats.reshape(b * k, 1, c)
        if args.num_beams > 1:
            ys, _ = beam_decode(
                decoder, cap_vars, obj_token, config.model.max_des_len,
                args.num_beams, length_penalty=args.length_penalty,
            )
        else:
            ys = greedy_decode(
                decoder, cap_vars, obj_token, config.model.max_des_len
            )
        out["lang_cap_ids"] = np.asarray(ys).reshape(b, k, -1)
        assignment = assign_objects(
            jnp.asarray(out["aggregated_vote_xyz"]),
            jnp.asarray(out["objectness_scores"]),
            jnp.asarray(arrays["center_label"][..., :3]),
        )
        collect_caption_candidates(
            out,
            {**arrays, "scene_id": batch["scene_id"]},
            tokenizer,
            organized,
            object_assignment=np.asarray(assignment),
            candidates=candidates,
        )

    metrics = score_captions(corpus, candidates)
    for name, value in sorted(metrics.items()):
        print(f"[caption_eval] {name}: {value:.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


if __name__ == "__main__":
    main()
