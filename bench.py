"""Benchmark: ScanRefer grounding inference throughput on one TPU chip.

Runs the flagship JointNet grounding path (PointNet++ backbone -> voting ->
proposals -> relation -> frozen BERT -> cross-modal match -> cluster_ref)
on synthetic 40k-point scenes at the reference's canonical shapes
(run.sh: batch 8, 40960 points, multiview+normal+height inputs = 132 extra
channels, 256 proposals, lang_num_max 8, 50-token BERT inputs).

Measures STEADY-STATE streaming throughput: a jitted lax.scan executor
processes a device-resident stream of K batches back-to-back, the way a
production serving/training pipeline feeds the chip (prefetched inputs,
no per-batch host round-trip). The per-call sync latency is reported
separately under "sync_step_ms" (it includes ~30ms of axon relay
dispatch that a pipelined deployment never pays per step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline divides by an ESTIMATED PyTorch/A100 reference throughput
(BASELINE.md step 0: the reference publishes no throughput; 20 scenes/sec
is a placeholder until the A100 measurement exists — recorded under
"baseline_assumed").
"""

import json
import os
import subprocess
import sys
import time

import jax
import numpy as np

from vlp3d.utils.jitcache import enable_persistent_cache

enable_persistent_cache()

from vlp3d.config import Config, DatasetConfig, ModelConfig
from vlp3d.data.synthetic import make_batch
from vlp3d.models.jointnet import JointNet

BASELINE_SCENES_PER_SEC = 20.0  # assumed A100 reference; see module doc
STREAM_LEN = 8  # batches per scan dispatch


def main():
    t_start = time.perf_counter()
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
    scalars = {k: v for k, v in batch.items() if np.ndim(v) == 0}
    arrays = {k: np.asarray(v) for k, v in batch.items() if k not in scalars}
    stream = jax.device_put(
        {
            k: np.broadcast_to(v[None], (STREAM_LEN,) + v.shape).copy()
            for k, v in arrays.items()
        }
    )
    scalars = jax.device_put(scalars)
    batch = jax.device_put(batch)
    model = JointNet(config)
    rngs = {"params": jax.random.key(0)}
    # jit the init: eager init dispatches thousands of tiny ops (slow over
    # the axon tunnel); one compiled program instead
    variables = jax.jit(lambda b: model.init(rngs, b, train=False))(batch)

    import jax.numpy as jnp

    def predict(variables, b):
        out = model.apply(variables, b, train=False)
        # grounding prediction: argmax over objectness-masked confidences
        masks = out["objectness_masks"]  # (B, K)
        l = b["input_ids"].shape[1]
        conf = out["cluster_ref"].reshape(batch_size, l, -1)
        pred = jnp.argmax(conf * masks[:, None, :], axis=-1)
        return pred, out["pred_center"], out["pred_size"]

    infer = jax.jit(predict)

    @jax.jit
    def infer_stream(variables, stream, scalars):
        def step(_, b):
            return None, predict(variables, {**b, **scalars})

        _, outs = jax.lax.scan(step, None, stream)
        return outs

    # NOTE: jax.block_until_ready does NOT block on the axon backend
    # (dispatch returns in ~1-2 ms while the device runs); only value
    # materialization waits for completion, so every timed call below is
    # followed by a float() of a reduced output (PERF.md "Benchmark
    # integrity"). The model consumes `random`, a live scalar we vary per
    # timed call so no relay-side result cache can replay an identical
    # (program, inputs) pair.
    def consume(outs):
        # materializing any output of the single XLA execution waits for
        # the whole program; pred is the smallest buffer
        return np.asarray(outs[0]).sum()

    def vary(b, i):
        return {**b, "random": jnp.float32(0.25 + 1e-6 * i)}

    # warmup / compile
    consume(infer(variables, batch))
    consume(infer_stream(variables, stream, scalars))

    # Per PERF.md "relay variance": the tunnel's dispatch latency is
    # bimodal between processes and noisy within one, so take MORE timed
    # dispatches and report the median (headline) alongside min/max —
    # a single unlucky dispatch can no longer swing the round artifact.
    sync_times = []
    for i in range(7):
        t0 = time.perf_counter()
        consume(infer(variables, vary(batch, i)))
        sync_times.append(time.perf_counter() - t0)
    sync_ms = float(np.median(sync_times[1:])) * 1e3

    times = []
    for i in range(7):
        t0 = time.perf_counter()
        consume(infer_stream(variables, stream, vary(scalars, i)))
        times.append(time.perf_counter() - t0)
    # amortize the single dispatch over the stream
    per_step = [t / STREAM_LEN for t in times[1:]]
    mean_t = float(np.median(per_step))
    scenes_per_sec = batch_size / mean_t
    assert mean_t * STREAM_LEN > 5e-3, "below relay dispatch floor"
    step_spread_ms = [round(min(per_step) * 1e3, 2),
                      round(max(per_step) * 1e3, 2)]

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
                # BASELINE.md "Defending the 20 scenes/s assumption":
                # the A100 reference throughput is a RECONSTRUCTION
                # (no NVIDIA GPU here); plausible range below. At the
                # pessimistic end vs_baseline scales by 20/35.
                "baseline_error_bars": [15.0, 35.0],
                "batch_size": batch_size,
                "num_points": num_points,
                "mean_step_ms": round(mean_t * 1e3, 2),
                # median of 6 timed stream dispatches; [min, max] shows
                # the intra-run relay spread (PERF.md "relay variance")
                "step_spread_ms": step_spread_ms,
                "sync_step_ms": round(sync_ms, 2),
                "stream_len": STREAM_LEN,
                "backend": jax.default_backend(),
                # full perf suite (training/captioning/serving included)
                # so regressions outside the headline are driver-visible
                "suite": _run_suite(t_start),
            }
        )
    )


def _run_suite(t_start):
    """Best-effort benchmarks/run.py sweep (sa_stack / detection /
    grounding / captioning / joint_train at canonical batch 8, plus the
    batch-16 serving point) in watchdogged subprocesses — a hang or
    crash in any sweep never loses the headline metric."""
    here = os.path.dirname(os.path.abspath(__file__))
    runner = os.path.join(here, "benchmarks", "run.py")
    suite = {}

    def budget(want):
        # never let the suite push the inner run past the outer
        # watchdog: cap each sweep by the wall time remaining out of
        # ~2500s (outer timeout 2700 minus margin), so the headline
        # line always prints
        left = 2500 - (time.perf_counter() - t_start)
        return max(30, min(want, left))

    def sweep(tag, argv, timeout):
        added = 0
        try:
            proc = subprocess.run(
                [sys.executable, runner, *argv],
                capture_output=True, text=True, timeout=timeout,
            )
            for line in proc.stdout.splitlines():
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # diagnostic line that merely looks like JSON
                name = rec.pop("benchmark", tag)
                suite[f"{tag}{name}" if tag else name] = rec
                added += 1
            if proc.returncode != 0 and not added:
                suite[tag or "all"] = {"error": proc.stderr[-400:]}
        except subprocess.TimeoutExpired:
            suite[tag or "all"] = {"error": "timeout"}
        except Exception as exc:  # noqa: BLE001 - suite is best-effort
            suite[tag or "all"] = {"error": repr(exc)}

    sweep("", ["--bench", "all"], timeout=budget(1500))
    sweep("serving_b16_", ["--bench", "grounding", "--batch", "16"],
          timeout=budget(900))
    return suite


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
        sys.exit(0)
    # The axon relay occasionally throws a transient FailedPrecondition
    # — and, worse, sometimes HANGS the backend outright (observed: a
    # trivial matmul never returning for 25+ min, then recovering).
    # Exceptions can be retried in-process, but a hang cannot, so each
    # attempt runs in a watchdogged subprocess; a fresh interpreter also
    # re-establishes the tunnel connection.
    for attempt in range(3):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                timeout=2700,
            )
            if proc.returncode == 0:
                break
        except subprocess.TimeoutExpired:
            pass
        if attempt == 2:
            sys.exit(1)
        time.sleep(60)
