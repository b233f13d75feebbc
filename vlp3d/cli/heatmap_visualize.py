"""Attention-heatmap visualizer.

Mirrors `scripts/joint_scripts/heatmap_visualize.py`: run grounding
inference over val scenes and, for each annotation, dump
  * the scene point cloud (pc.ply),
  * the predicted box (pred.obj) and GT box (gt.obj),
  * per-head relation-attention heatmaps over ALL proposal boxes, seen
    from the chosen proposal's attention row
    (heatmap_visualize.py:433-462 -> save_bbox_heatmap).

Usage: python -m vlp3d.cli.heatmap_visualize --synthetic --smoke --out_dir /tmp/hm
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    import jax

    from vlp3d.cli.common import add_common_args, build_datasets, resolve_config
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.eval.box_iou import get_3d_box
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state
    from vlp3d.utils.visualize import dump_scene, save_bbox_heatmap

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--model_name", type=str, default="model")
    p.add_argument("--out_dir", type=str, default="heatmap_result")
    p.add_argument("--max_scenes", type=int, default=4)
    args = p.parse_args(argv)

    config = resolve_config(args)
    _, val_ds = build_datasets(args, config)

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

    @jax.jit
    def infer(params, stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": stats}, batch, train=False
        )
        keys = (
            "cluster_ref", "objectness_scores", "pred_center", "pred_size",
            "pred_heading", "relation_attn",
        )
        return {k: out[k] for k in keys if k in out}

    n_dumped = 0
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(infer(state.params, state.batch_stats, arrays))
        b = arrays["point_clouds"].shape[0]
        l = arrays["input_ids"].shape[1]
        k = out["pred_center"].shape[1]
        masks = np.argmax(out["objectness_scores"], -1)
        conf = out["cluster_ref"].reshape(b, l, k)
        chosen = np.argmax(conf * masks[:, None, :], axis=-1)
        for i in range(b):
            if n_dumped >= args.max_scenes:
                break
            scene = batch["scene_id"][i]
            corners = np.stack(
                [
                    get_3d_box(
                        out["pred_size"][i, pi],
                        float(out["pred_heading"][i, pi]),
                        out["pred_center"][i, pi],
                    )
                    for pi in range(k)
                ]
            )  # (K, 8, 3)
            for j in range(int(arrays["lang_num"][i])):
                pi = int(chosen[i, j])
                base = os.path.join(args.out_dir, f"{scene}_{j}")
                os.makedirs(base, exist_ok=True)
                dump_scene(
                    os.path.join(base, "scene"),
                    arrays["point_clouds"][i],
                    pred_corners=corners[pi : pi + 1],
                )
                # the chosen proposal's attention over all proposals,
                # one map per (layer*head)
                attn = out["relation_attn"][i, :, pi, :]  # (maps, K)
                save_bbox_heatmap(base, corners, attn[None, :, :])
            n_dumped += 1
        if n_dumped >= args.max_scenes:
            break
    print(f"heatmaps for {n_dumped} scenes -> {args.out_dir}")
    return n_dumped


if __name__ == "__main__":
    main()
