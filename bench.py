"""Benchmark: ScanRefer grounding inference throughput on one TPU chip.

Runs the flagship JointNet grounding path (PointNet++ backbone -> voting ->
proposals -> relation -> frozen BERT -> cross-modal match -> cluster_ref)
on synthetic 40k-point scenes at the reference's canonical shapes
(run.sh: batch 8, 40960 points, multiview+normal+height inputs = 132 extra
channels, 256 proposals, lang_num_max 8, 50-token BERT inputs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by an ESTIMATED PyTorch/A100 reference throughput
(BASELINE.md step 0: the reference publishes no throughput; 20 scenes/sec
is a placeholder until the A100 measurement exists — recorded under
"baseline_assumed").
"""

import json
import time

import jax
import numpy as np

from vlp3d.config import Config, DatasetConfig, ModelConfig
from vlp3d.data.synthetic import make_batch
from vlp3d.models.jointnet import JointNet

BASELINE_SCENES_PER_SEC = 20.0  # assumed A100 reference; see module doc


def main():
    batch_size = 8
    num_points = 40960
    config = Config(
        dataset=DatasetConfig(),
        model=ModelConfig(use_con=False, no_caption=True),
    )
    batch = make_batch(
        config, batch_size=batch_size, num_points=num_points, istrain=0
    )
    # keep only what inference consumes, and put it on device ONCE — a real
    # input pipeline prefetches/overlaps H2D, so steady-state throughput
    # must not re-pay the host->chip transfer per step
    needed = (
        "point_clouds", "input_ids", "bert_attention_mask", "lang_num",
        "epoch", "istrain", "random",
    )
    batch = {k: batch[k] for k in needed}
    batch = jax.device_put(batch)
    model = JointNet(config)
    rngs = {"params": jax.random.key(0)}
    # jit the init: eager init dispatches thousands of tiny ops (slow over
    # the axon tunnel); one compiled program instead
    variables = jax.jit(lambda b: model.init(rngs, b, train=False))(batch)

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, batch, train=False)
        # grounding prediction: argmax over objectness-masked confidences
        import jax.numpy as jnp

        masks = out["objectness_masks"]  # (B, K)
        l = batch["input_ids"].shape[1]
        conf = out["cluster_ref"].reshape(batch_size, l, -1)
        pred = jnp.argmax(conf * masks[:, None, :], axis=-1)
        return pred, out["pred_center"], out["pred_size"]

    # warmup / compile
    jax.block_until_ready(infer(variables, batch))

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(infer(variables, batch))
        times.append(time.perf_counter() - t0)
    mean_t = float(np.mean(times[1:]))
    scenes_per_sec = batch_size / mean_t

    print(
        json.dumps(
            {
                "metric": "scanrefer_grounding_inference_scenes_per_sec_per_chip",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(
                    scenes_per_sec / BASELINE_SCENES_PER_SEC, 3
                ),
                "baseline_assumed": BASELINE_SCENES_PER_SEC,
                "batch_size": batch_size,
                "num_points": num_points,
                "mean_step_ms": round(mean_t * 1e3, 2),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    # the axon relay occasionally throws a transient FailedPrecondition;
    # retry so the driver's official run survives a hiccup
    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20)
