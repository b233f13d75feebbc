"""Grounding visualizer.

Mirrors `scripts/joint_scripts/ground_visualize.py:354-460`'s dump
contract: per scene directory
  * pc.ply                                   — the input point cloud,
  * gt_{object_id}_{object_name}.ply         — the GT reference box,
  * pred_{object_id}_{object_name}_{ann_id}_{score:.5f}_{iou:.5f}.ply
                                             — the chosen proposal box,
box wireframes as colored-vertex PLY (GT green, pred blue).

Usage: python -m vlp3d.cli.ground_visualize --synthetic --smoke --out_dir vis
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    import jax

    from vlp3d.cli.common import add_common_args, build_datasets, resolve_config
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.eval.box_iou import box3d_iou, get_3d_box
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
    p.add_argument("--max_scenes", type=int, default=8)
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
            "pred_heading",
        )
        return {k: out[k] for k in keys}

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    n_dumped = 0
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(infer(state.params, state.batch_stats, arrays))
        b = arrays["point_clouds"].shape[0]
        l = arrays["input_ids"].shape[1]
        k = out["pred_center"].shape[1]
        conf = out["cluster_ref"].reshape(b, l, k)
        conf_soft = softmax(conf)
        chosen = np.argmax(conf, axis=-1)  # ground_visualize.py:429
        mean_size = config.dataset.mean_size_arr()
        for i in range(b):
            if n_dumped >= args.max_scenes:
                break
            scene = batch["scene_id"][i]
            sdir = os.path.join(args.out_dir, scene)
            os.makedirs(sdir, exist_ok=True)
            if not os.path.exists(os.path.join(sdir, "pc.ply")):
                write_ply_points(
                    os.path.join(sdir, "pc.ply"),
                    np.asarray(arrays["point_clouds"][i])[:, :3],
                )
            for j in range(int(arrays["lang_num"][i])):
                oid = int(arrays["object_id_list"][i, j])
                name = batch["object_name_list"][i][j] if isinstance(
                    batch.get("object_name_list"), list
                ) else "object"
                ann = int(arrays["ann_id_list"][i, j])
                gt_center = arrays["ref_center_label_list"][i, j, :3]
                gt_size = (
                    mean_size[arrays["ref_size_class_label_list"][i, j]]
                    + arrays["ref_size_residual_label_list"][i, j]
                )
                gt_corners = get_3d_box(gt_size, 0.0, gt_center)
                write_ply_box_heatmap(
                    os.path.join(sdir, f"gt_{oid}_{name}.ply"),
                    gt_corners[None], np.ones((1,)), color=(0, 255, 0),
                    gain=1.0,
                )
                pi = int(chosen[i, j])
                pred_corners = get_3d_box(
                    out["pred_size"][i, pi],
                    float(out["pred_heading"][i, pi]),
                    out["pred_center"][i, pi],
                )
                iou = box3d_iou(pred_corners, gt_corners)
                score = float(conf_soft[i, j, pi])
                write_ply_box_heatmap(
                    os.path.join(
                        sdir,
                        f"pred_{oid}_{name}_{ann}_{score:.5f}_{iou:.5f}.ply",
                    ),
                    pred_corners[None], np.ones((1,)), color=(0, 0, 255),
                    gain=1.0,
                )
            n_dumped += 1
        if n_dumped >= args.max_scenes:
            break
    print(f"ground visualizations for {n_dumped} scenes -> {args.out_dir}")
    return n_dumped


if __name__ == "__main__":
    main()
