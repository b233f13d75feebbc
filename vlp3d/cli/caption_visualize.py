"""Caption visualizer.

Mirrors `scripts/joint_scripts/caption_visualize.py:293-420`'s dump
contract: per scene directory
  * pc.ply — the input point cloud,
  * pred-{proposal}-{class}.ply — each NMS+objectness-kept proposal box,
  * captions.json — {proposal_id: {object_name, description}} with the
    greedy-decoded caption per kept proposal.

Usage: python -m vlp3d.cli.caption_visualize --synthetic --smoke --out_dir vis
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    import jax

    from vlp3d.cli.common import add_common_args, build_datasets, resolve_config
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.tokenizer import HashTokenizer, load_tokenizer
    from vlp3d.eval.captioning import decode_caption
    from vlp3d.eval.detection import parse_predictions
    from vlp3d.models.caption import CaptionDecoder, greedy_decode
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state
    from vlp3d.utils.visualize import write_ply_box_heatmap, write_ply_points

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--model_name", type=str, default="model")
    p.add_argument("--out_dir", type=str, default="vis")
    p.add_argument("--max_scenes", type=int, default=4)
    args = p.parse_args(argv)

    import dataclasses

    config = resolve_config(args)
    if config.model.no_caption:
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model, no_caption=False)
        )
    _, val_ds = build_datasets(args, config)
    tokenizer = (
        HashTokenizer() if args.synthetic
        else load_tokenizer(args.bert_vocab or None)
    )

    model = JointNet(config)
    loader = BatchIterator(val_ds, config.train.batch_size, drop_last=False)
    sample = next(iter(loader))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    state = create_state(model, make_optimizer(), sample, config.train.seed)
    if args.model_dir:
        snap = ckpt.load_params(args.model_dir, args.model_name)
        state = state.replace(
            params=snap["params"],
            batch_stats=snap.get("batch_stats", state.batch_stats),
        )
    decoder = CaptionDecoder(
        vocab_size=config.model.vocab_size,
        max_len=config.model.max_des_len + 2,
    )

    @jax.jit
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        keys = (
            "objectness_scores", "pred_center", "pred_size", "pred_heading",
            "sem_cls_scores", "aggregated_vote_features",
        )
        return {k: out[k] for k in keys}

    post = {
        "remove_empty_box": False,
        "use_3d_nms": True,
        "nms_iou": 0.25,
        "use_old_type_nms": False,
        "cls_nms": True,
        "per_class_proposal": False,
        "conf_thresh": 0.05,
    }

    n_dumped = 0
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(infer(state.params, state.batch_stats, arrays))
        b, k, c = out["aggregated_vote_features"].shape
        obj_token = out["aggregated_vote_features"].reshape(b * k, 1, c)
        ys = np.asarray(
            greedy_decode(
                decoder,
                {"params": state.params["caption"]},
                obj_token,
                config.model.max_des_len,
            )
        ).reshape(b, k, -1)
        pred_masks, _ = parse_predictions(out, post)
        obj_masks = np.argmax(out["objectness_scores"], -1)
        keep = pred_masks * obj_masks  # caption_visualize.py:361-368
        sem_cls = np.argmax(out["sem_cls_scores"], -1)
        for i in range(b):
            if n_dumped >= args.max_scenes:
                break
            scene = batch["scene_id"][i]
            sdir = os.path.join(args.out_dir, scene)
            os.makedirs(sdir, exist_ok=True)
            write_ply_points(
                os.path.join(sdir, "pc.ply"),
                np.asarray(arrays["point_clouds"][i])[:, :3],
            )
            from vlp3d.eval.box_iou import get_3d_box

            candidates = {}
            for pi in range(k):
                if keep[i, pi] != 1:
                    continue
                caption = decode_caption(tokenizer, ys[i, pi])
                cls = int(sem_cls[i, pi])
                candidates[str(pi)] = {
                    "object_name": f"class{cls}",
                    "description": caption,
                }
                corners = get_3d_box(
                    out["pred_size"][i, pi],
                    float(out["pred_heading"][i, pi]),
                    out["pred_center"][i, pi],
                )
                write_ply_box_heatmap(
                    os.path.join(sdir, f"pred-{pi}-class{cls}.ply"),
                    corners[None], np.ones((1,)),
                    color=tuple(int(v) for v in np.random.default_rng(cls)
                                .integers(64, 255, 3)),
                    gain=1.0,
                )
            with open(os.path.join(sdir, "captions.json"), "w") as f:
                json.dump(candidates, f, indent=2)
            n_dumped += 1
        if n_dumped >= args.max_scenes:
            break
    print(f"caption visualizations for {n_dumped} scenes -> {args.out_dir}")
    return n_dumped


if __name__ == "__main__":
    main()
