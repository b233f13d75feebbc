"""Grounding prediction dump — the benchmark predict contract.

Mirrors `scripts/joint_scripts/train_3dvlp.py predict()` (:423-538) and
benchmark/predict.py's output contract: pred.json with one record per
annotation: {scene_id, object_id, ann_id, bbox (8x3 corners),
unique_multiple, others}.
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
    from vlp3d.eval.box_iou import get_3d_box
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--model_dir", type=str, required=False, default="")
    p.add_argument("--out", type=str, default="pred.json")
    args = p.parse_args(argv)

    config = resolve_config(args)
    _, val_ds = build_datasets(args, config)

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

    @jax.jit
    def infer(params, batch_stats, batch):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=False,
        )
        return {
            k: out[k]
            for k in (
                "cluster_ref", "objectness_scores", "pred_center",
                "pred_size", "pred_heading",
            )
        }

    preds = []
    loader = BatchIterator(
        val_ds, config.train.batch_size, drop_last=False,
        num_workers=config.train.num_workers,
    )
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        b = arrays["point_clouds"].shape[0]
        out = jax.device_get(
            infer(state.params, state.batch_stats, arrays)
        )
        l = arrays["input_ids"].shape[1]
        k = out["pred_center"].shape[1]
        masks = np.argmax(out["objectness_scores"], -1)
        conf = out["cluster_ref"].reshape(b, l, k)
        chosen = np.argmax(conf * masks[:, None, :], axis=-1)
        for i in range(b):
            for j in range(int(arrays["lang_num"][i])):
                pi = int(chosen[i, j])
                bbox = get_3d_box(
                    out["pred_size"][i, pi],
                    float(out["pred_heading"][i, pi]),
                    out["pred_center"][i, pi],
                )
                preds.append(
                    {
                        "scene_id": batch["scene_id"][i],
                        "object_id": int(arrays["object_id_list"][i, j]),
                        "ann_id": int(arrays["ann_id_list"][i, j]),
                        "bbox": bbox.tolist(),
                        "unique_multiple": int(
                            arrays["unique_multiple_list"][i, j]
                        ),
                        "others": 1
                        if int(arrays["object_cat_list"][i, j]) == 17
                        else 0,
                    }
                )
    with open(args.out, "w") as f:
        json.dump(preds, f)
    print(f"dumped {len(preds)} predictions to {args.out}")
    return preds


if __name__ == "__main__":
    main()
