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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp3d.config import Config
from vlp3d.models.jointnet import JointNet

# batch keys the grounding forward consumes (everything else is labels)
STREAM_KEYS = (
    "point_clouds", "input_ids", "bert_attention_mask", "lang_num",
)
SCALAR_KEYS = ("epoch", "istrain", "random")


class _StreamingPredictor:
    """Shared streaming harness: one jitted lax.scan dispatch per list of
    equally-shaped batches (subclass provides `_predict`).

    Pass ``mesh`` (e.g. `vlp3d.parallel.mesh.make_mesh()`) to serve
    data-parallel: variables replicate, the batch axis shards over the
    mesh's first axis, and GSPMD runs the one jitted program across the
    chips — the serving analogue of the training data mesh (SURVEY §2.7;
    the reference serves single-GPU only)."""

    def __init__(
        self,
        config: Config,
        variables,
        *,
        batch_size: int = 8,
        mesh: Mesh | None = None,
    ):
        self.config = config
        self.batch_size = batch_size
        self.mesh = mesh
        self.model = JointNet(config)
        if mesh is not None:
            if batch_size % mesh.size:
                raise ValueError(
                    f"batch_size={batch_size} must be divisible by the "
                    f"{mesh.size}-device serving mesh"
                )
            axis = mesh.axis_names[0]
            repl = NamedSharding(mesh, P())
            self._batch_sh = NamedSharding(mesh, P(axis))
            self._stream_sh = NamedSharding(mesh, P(None, axis))
            variables = jax.device_put(variables, repl)
        else:
            # checkpoint restores hand back host numpy arrays; without a
            # one-time device_put every batch dispatch would re-transfer
            # the full parameter tree host->device
            variables = jax.device_put(variables)
        self.variables = variables
        self._scalars = {
            "epoch": jnp.int32(0),
            "istrain": jnp.int32(0),
            "random": jnp.float32(0.25),
        }

        predict = self._predict

        @jax.jit
        def run_stream(variables, stream, scalars):
            def step(_, b):
                return None, predict(variables, {**b, **scalars})

            return jax.lax.scan(step, None, stream)[1]

        self._run_stream = run_stream
        self._run_one = jax.jit(
            lambda v, b: predict(v, {**b, **self._scalars})
        )

    def _put(self, x, sharding):
        if self.mesh is None:
            return jnp.asarray(x)
        return jax.device_put(np.asarray(x), sharding)

    def run_padded(self, batch_k: dict) -> dict:
        """Run one device batch from k <= batch_size occupied rows.

        Transfers ONLY the occupied rows and pads to the compiled batch
        size ON DEVICE (repeating row 0 — the micro-batcher's padding
        convention), via a per-occupancy jitted concat that feeds the
        one compiled model program. Host-side padding shipped the full
        padded batch per request (~173 MB at canonical shapes); at
        occupancy 1 that is 8x more H2D traffic than the real data —
        ~3.5 s/request measured over the axon tunnel, and still 8x PCIe
        bandwidth on a real TPU-VM host. The mesh path keeps host
        padding (padded rows shard across devices)."""
        k = next(iter(batch_k.values())).shape[0]
        if k > self.batch_size:
            raise ValueError(f"occupancy {k} > batch_size {self.batch_size}")
        if self.mesh is not None:
            if k < self.batch_size:
                batch_k = {
                    key: np.concatenate(
                        [np.asarray(v)]
                        + [np.asarray(v[:1])] * (self.batch_size - k),
                        axis=0,
                    )
                    for key, v in batch_k.items()
                }
            return self([batch_k])[0]
        dev = {key: jnp.asarray(v) for key, v in batch_k.items()}
        if k < self.batch_size:
            dev = self._pad_on_device(dev)
        out = self._run_one(self.variables, dev)
        return jax.device_get(out)

    @functools.cached_property
    def _pad_on_device(self):
        pad_to = self.batch_size

        @jax.jit  # tiny concat program; compiles per occupancy k
        def pad(b):
            return {
                key: jnp.concatenate(
                    [
                        v,
                        jnp.broadcast_to(
                            v[:1], (pad_to - v.shape[0],) + v.shape[1:]
                        ),
                    ],
                    axis=0,
                )
                for key, v in b.items()
            }

        return pad

    def __call__(self, batches: list[dict]) -> list[dict]:
        """batches: host batch dicts with STREAM_KEYS arrays of identical
        shapes. One device dispatch for the whole list."""
        if len(batches) == 1:
            out = self._run_one(
                self.variables,
                {
                    k: self._put(batches[0][k], getattr(self, "_batch_sh", None))
                    for k in STREAM_KEYS
                },
            )
            return [jax.device_get(out)]
        stream = {
            k: self._put(
                np.stack([np.asarray(b[k]) for b in batches]),
                getattr(self, "_stream_sh", None),
            )
            for k in STREAM_KEYS
        }
        outs = jax.device_get(
            self._run_stream(self.variables, stream, self._scalars)
        )
        n = len(batches)
        return [
            {k: np.asarray(v[i]) for k, v in outs.items()} for i in range(n)
        ]


class CaptionPredictor(_StreamingPredictor):
    """Streaming Scan2Cap serving: grounding forward + KV-cached greedy
    caption decode per proposal, one dispatch per batch stream.

    `config` should have no_caption=True for the forward (the caption
    branch is train-only in JointNet); `variables` must still CONTAIN
    the trained `caption` submodule params — pass them via
    `caption_params` when the forward variables lack them.

    `num_beams > 1` switches the greedy decode for the fixed-shape beam
    search (models/caption.py beam_decode) — higher caption quality at
    ~num_beams x the decode cost."""

    def __init__(
        self,
        config: Config,
        variables,
        *,
        caption_params=None,
        batch_size: int = 8,
        mesh: Mesh | None = None,
        num_beams: int = 1,
        length_penalty: float = 1.0,
    ):
        from vlp3d.models.caption import (
            CaptionDecoder, beam_decode, greedy_decode,
        )

        cap = (
            caption_params
            if caption_params is not None
            else variables["params"]["caption"]
        )
        decoder = CaptionDecoder(
            vocab_size=config.model.vocab_size,
            max_len=config.model.max_des_len + 2,
        )
        max_des_len = config.model.max_des_len

        def predict(variables, b):
            # is_eval: the in-module caption branch is train-only (it
            # needs ref labels); decoding happens below via greedy_decode
            out = self.model.apply(variables, b, train=False, is_eval=True)
            feats = out["aggregated_vote_features"]
            bsz, k, c = feats.shape
            obj_token = feats.reshape(bsz * k, 1, c)
            if num_beams > 1:
                ys, _ = beam_decode(
                    decoder, {"params": cap}, obj_token, max_des_len,
                    num_beams, length_penalty=length_penalty,
                )
            else:
                ys = greedy_decode(
                    decoder, {"params": cap}, obj_token, max_des_len
                )
            return {
                "caption_ids": ys.reshape(bsz, k, -1),
                "pred_center": out["pred_center"],
                "pred_size": out["pred_size"],
                "pred_heading": out["pred_heading"],
                "objectness_scores": out["objectness_scores"],
                "sem_cls_scores": out["sem_cls_scores"],
            }

        self._predict = predict
        super().__init__(
            config, variables, batch_size=batch_size, mesh=mesh
        )


class AnswerPredictor(_StreamingPredictor):
    """Streaming ScanQA serving: joint forward with the answer head,
    returning top-k answer ids + scores per question.

    `config` must have use_answer=True."""

    def __init__(
        self, config: Config, variables, *, topk: int = 10,
        batch_size: int = 8, mesh: Mesh | None = None,
    ):
        assert config.model.use_answer, "AnswerPredictor needs use_answer"

        def predict(variables, b):
            out = self.model.apply(variables, b, train=False, is_eval=True)
            scores = out["answer_scores"]  # (B[, L], num_answers)
            scores2 = scores.reshape(-1, scores.shape[-1])
            top_scores, top_ids = jax.lax.top_k(scores2, topk)
            return {
                "answer_scores": scores,
                "answer_top_ids": top_ids.reshape(
                    scores.shape[:-1] + (topk,)
                ),
                "answer_top_scores": top_scores.reshape(
                    scores.shape[:-1] + (topk,)
                ),
            }

        self._predict = predict
        super().__init__(
            config, variables, batch_size=batch_size, mesh=mesh
        )


class GroundingPredictor(_StreamingPredictor):
    """Jitted streaming ScanRefer grounding inference.

    The per-sentence prediction is argmax over objectness-masked
    confidences (eval_ground.py:100-120 / train_3dvlp.py:489-492).
    `config` should be grounding-configured (e.g. no_caption=True,
    use_con=False): task heads that are enabled run in the forward and may
    require label keys beyond STREAM_KEYS."""

    def __init__(
        self, config: Config, variables, *, batch_size: int = 8,
        mesh: Mesh | None = None,
    ):
        def predict(variables, b):
            out = self.model.apply(variables, b, train=False, is_eval=True)
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

        self._predict = predict
        super().__init__(
            config, variables, batch_size=batch_size, mesh=mesh
        )
