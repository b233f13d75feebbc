"""Grounding evaluation entry point (scripts/joint_scripts/ground_eval.py).

Runs the full val split through the grounding model, reports Acc@0.25/0.5
with the unique/multiple x others breakdown, lang/obj/sem accuracy, and
optional detection mAP via the AP calculator.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    import jax

    from vlp3d.cli.common import add_common_args, build_datasets, resolve_config
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.eval.detection import (
        APCalculator,
        parse_groundtruths,
        parse_predictions,
    )
    from vlp3d.eval.grounding import final_eval_breakdown, get_eval
    from vlp3d.models.jointnet import JointNet
    from vlp3d.train import checkpoint as ckpt
    from vlp3d.train.optimizer import make_optimizer
    from vlp3d.train.state import create_state

    p = argparse.ArgumentParser()
    add_common_args(p)
    p.add_argument("--model_dir", type=str, default="")
    p.add_argument("--model_name", type=str, default="model")
    p.add_argument("--detection_map", action="store_true")
    args = p.parse_args(argv)

    config = resolve_config(args)
    _, val_ds = build_datasets(args, config)
    mean_size = config.dataset.mean_size_arr()

    model = JointNet(config)
    loader = BatchIterator(
        val_ds, config.train.batch_size, drop_last=True,
        num_workers=config.train.num_workers,
    )
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
            "objectness_scores", "cluster_ref", "pred_center", "pred_size",
            "pred_heading", "sem_cls_scores", "lang_scores",
        )
        return {k: out[k] for k in keys if k in out}

    ious, multiple, others, lang_accs = [], [], [], []
    ap = APCalculator(0.25)
    ap5 = APCalculator(0.5)
    for batch in loader:
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        out = jax.device_get(infer(state.params, state.batch_stats, arrays))
        g = get_eval(out, arrays, mean_size_arr=mean_size)
        ious += g["ref_iou"]
        multiple += g["ref_multiple_mask"]
        others += g["ref_others_mask"]
        lang_accs.append(g["lang_acc"])
        if args.detection_map:
            _, preds = parse_predictions(
                {**out, "point_clouds": arrays["point_clouds"]}, {}
            )
            gts = parse_groundtruths(arrays, mean_size)
            ap.step(preds, gts)
            ap5.step(preds, gts)

    result = final_eval_breakdown(ious, multiple, others)
    result["lang_acc"] = float(np.mean(lang_accs)) if lang_accs else 0.0
    if args.detection_map:
        result["mAP@0.25"] = ap.compute_metrics()["mAP"]
        result["mAP@0.5"] = ap5.compute_metrics()["mAP"]
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
