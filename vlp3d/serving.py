"""Streaming inference executor — the production serving shape.

Packages the pattern bench.py measures: a single jitted `lax.scan` over a
device-resident stream of batches, which amortizes the per-dispatch relay
cost (~30 ms on axon) to <1 ms/step and keeps the chip busy back-to-back
(132 ms/step sync -> 34 ms/step streamed at the canonical grounding
shapes; PERF.md round-2 table).

Typical use:

    predictor = GroundingPredictor(config, variables)
    for batches in chunked(loader, stream_len):   # host prefetch
        preds = predictor(batches)                # one device dispatch

The grounding prediction per sentence is argmax over objectness-masked
confidences (eval_ground.py:100-120 / train_3dvlp.py:489-492).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.config import Config
from vlp3d.models.jointnet import JointNet

# batch keys the grounding forward consumes (everything else is labels)
STREAM_KEYS = (
    "point_clouds", "input_ids", "bert_attention_mask", "lang_num",
)
SCALAR_KEYS = ("epoch", "istrain", "random")


class GroundingPredictor:
    """Jitted streaming ScanRefer grounding inference on one chip.

    `config` should be grounding-configured (e.g. no_caption=True,
    use_con=False): task heads that are enabled run in the forward and may
    require label keys beyond STREAM_KEYS."""

    def __init__(self, config: Config, variables, *, batch_size: int = 8):
        self.config = config
        self.variables = variables
        self.batch_size = batch_size
        self.model = JointNet(config)
        self._scalars = {
            "epoch": jnp.int32(0),
            "istrain": jnp.int32(0),
            "random": jnp.float32(0.25),
        }

        def predict(variables, b):
            out = self.model.apply(variables, b, train=False)
            masks = out["objectness_masks"]  # (B, K)
            bsz, l = b["input_ids"].shape[:2]
            conf = out["cluster_ref"].reshape(bsz, l, -1)
            pred = jnp.argmax(conf * masks[:, None, :], axis=-1)
            return {
                "pred_ref": pred,  # (B, L) chosen proposal per sentence
                "pred_center": out["pred_center"],
                "pred_size": out["pred_size"],
                "pred_heading": out["pred_heading"],
            }

        @functools.partial(jax.jit, static_argnums=())
        def run_stream(variables, stream, scalars):
            def step(_, b):
                return None, predict(variables, {**b, **scalars})

            return jax.lax.scan(step, None, stream)[1]

        self._run_stream = run_stream
        self._run_one = jax.jit(
            lambda v, b: predict(v, {**b, **self._scalars})
        )

    def __call__(self, batches: list[dict]) -> list[dict]:
        """batches: list of host batch dicts (each with STREAM_KEYS arrays
        of identical shapes). Returns one prediction dict per batch
        (numpy). One device dispatch for the whole list."""
        if len(batches) == 1:
            out = self._run_one(
                self.variables,
                {k: jnp.asarray(batches[0][k]) for k in STREAM_KEYS},
            )
            return [jax.device_get(out)]
        stream = {
            k: jnp.stack([jnp.asarray(b[k]) for b in batches])
            for k in STREAM_KEYS
        }
        outs = jax.device_get(
            self._run_stream(self.variables, stream, self._scalars)
        )
        n = len(batches)
        return [
            {k: np.asarray(v[i]) for k, v in outs.items()} for i in range(n)
        ]
