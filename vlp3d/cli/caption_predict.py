"""Dense-captioning prediction dump — the Scan2Cap benchmark contract.

Mirrors `scripts/joint_scripts/caption_predict.py:162-250`: greedy-decode
a caption for every proposal, keep the NMS x objectness survivors
(POST_DICT at :176-184 — 3D class NMS, iou 0.25, conf 0.05), and dump
pred.json mapping scene_id -> [{caption, box (8x3 corners), sem_prob,
obj_prob}].
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    import jax

    from vlp3d.cli.common import add_common_args, build_datasets, resolve_config
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.tokenizer import load_tokenizer
    from vlp3d.eval.box_iou import get_3d_box
    from vlp3d.eval.captioning import decode_caption
    from vlp3d.eval.detection import parse_predictions
    from vlp3d.models.caption import CaptionDecoder, greedy_decode
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--out", type=str, default="pred.json")
    args = p.parse_args(argv)
    args.no_caption = False  # this entry point exists to decode captions

    config = resolve_config(args)
    _, val_ds = build_datasets(args, config)
    tokenizer = load_tokenizer(args.bert_vocab or None)

    model = JointNet(config)
    sample = next(iter(BatchIterator(val_ds, config.train.batch_size,
                                     drop_last=False)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    optimizer = make_optimizer()
    state = create_state(model, optimizer, sample, config.train.seed)
    if args.model_dir:
        snap = ckpt.load_params(args.model_dir, "model")
        state = state.replace(
            params=snap["params"],
            batch_stats=snap.get("batch_stats", state.batch_stats),
        )

    decoder = CaptionDecoder(
        vocab_size=config.model.vocab_size,
        max_len=config.model.max_des_len + 2,
    )
    cap_vars = {"params": state.params["caption"]}

    @jax.jit
    def infer(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=False,
        )
        return {
            k: out[k]
            for k in (
                "aggregated_vote_features", "objectness_scores",
                "sem_cls_scores", "pred_center", "pred_size",
                "pred_heading",
            )
        }

    # POST_DICT of caption_predict.py:176-184
    post = {
        "remove_empty_box": True,
        "use_3d_nms": True,
        "nms_iou": 0.25,
        "use_old_type_nms": False,
        "cls_nms": True,
        "per_class_proposal": True,
        "conf_thresh": 0.05,
    }

    outputs: dict = {}
    loader = BatchIterator(val_ds, config.train.batch_size, drop_last=False,
                           num_workers=config.train.num_workers)
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(infer(state.params, state.batch_stats, arrays))
        feats = out["aggregated_vote_features"]
        b, k, c = feats.shape
        obj_token = feats.reshape(b * k, 1, c)
        ys = np.asarray(
            greedy_decode(decoder, cap_vars, obj_token,
                          config.model.max_des_len)
        ).reshape(b, k, -1)

        pred_mask, _ = parse_predictions(
            {**out, "point_clouds": arrays["point_clouds"]}, post
        )
        obj_mask = np.argmax(out["objectness_scores"], -1)
        keep = (np.asarray(pred_mask) * obj_mask).astype(bool)

        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        sem_prob = softmax(out["sem_cls_scores"])
        obj_prob = softmax(out["objectness_scores"])

        for i in range(b):
            scene_id = batch["scene_id"][i]
            scene_outputs = []
            for j in range(k):
                if not keep[i, j]:
                    continue
                box = get_3d_box(
                    out["pred_size"][i, j],
                    float(out["pred_heading"][i, j]),
                    out["pred_center"][i, j],
                )
                scene_outputs.append(
                    {
                        "caption": decode_caption(tokenizer, ys[i, j]),
                        "box": box.tolist(),
                        "sem_prob": sem_prob[i, j].tolist(),
                        "obj_prob": obj_prob[i, j].tolist(),
                    }
                )
            outputs[scene_id] = scene_outputs

    with open(args.out, "w") as f:
        json.dump(outputs, f, indent=4)
    print(f"dumped captions for {len(outputs)} scenes to {args.out}")
    return outputs


if __name__ == "__main__":
    main()
