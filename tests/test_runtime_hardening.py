"""Production-runtime hardening: async snapshots, SIGTERM preemption
handling, jax.profiler trace capture.

Reference points: the reference saves synchronously and only handles ^C
(solver_3dvlp.py:356-359, 1137-1245) and has no profiler integration
(SURVEY §5: hand-rolled phase timers only). Here best-model snapshots
commit on a background thread (orbax async), SIGTERM (TPU-VM/SLURM
preemption) routes into the same save-and-exit path, and --profile_dir
captures a device trace over steady-state train iterations.
"""

import glob
import json
import os
import signal
import time

import jax.numpy as jnp
import numpy as np
import pytest

from vlp3d.data.dataset import BatchIterator
from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config
from vlp3d.train import checkpoint as ckpt
from vlp3d.train.solver import Solver


def test_async_snapshot_round_trip(tmp_path):
    """save_params returns before the commit; a follow-up load (which
    joins the in-flight write) sees exactly what was staged — including
    when the staged tree is mutated after save() returns."""
    params = {"dense": {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}}
    stats = {"bn": {"mean": jnp.zeros(3)}}
    ckpt.save_params(str(tmp_path), "snap", params, stats)
    restored = ckpt.load_params(str(tmp_path), "snap")
    np.testing.assert_array_equal(restored["params"]["dense"]["w"],
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(restored["batch_stats"]["bn"]["mean"],
                                  np.zeros(3))
    # overwrite (force=True) with new values; second round trip wins
    params2 = {"dense": {"w": params["dense"]["w"] + 1,
                         "b": params["dense"]["b"]}}
    ckpt.save_params(str(tmp_path), "snap", params2)
    r2 = ckpt.load_params(str(tmp_path), "snap")
    np.testing.assert_array_equal(r2["params"]["dense"]["w"],
                                  np.arange(6.0).reshape(2, 3) + 1)
    ckpt.wait_until_finished()


def test_load_params_is_platform_portable(tmp_path):
    """load_params must restore HOST numpy leaves, never replay the
    saved device shardings — a snapshot written on a CPU box previously
    died on the TPU backend with "Device TFRT_CPU_0 was not found in
    jax.local_devices()" (and vice versa). Consumers device_put/shard
    downstream."""
    params = {"w": jnp.arange(12.0).reshape(3, 4)}
    ckpt.save_params(str(tmp_path), "snap", params)
    import jax

    restored = ckpt.load_params(str(tmp_path), "snap")
    for leaf in jax.tree.leaves(restored):
        assert isinstance(leaf, np.ndarray), type(leaf)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  np.arange(12.0).reshape(3, 4))


@pytest.mark.slow
def test_profile_trace_and_sigterm(tmp_path):
    """One tiny solver exercises both: (a) --profile_dir writes an
    xprof-readable trace during epoch 0; (b) SIGTERM mid-training saves
    the resume checkpoint and exits cleanly (preemption contract)."""
    config = tiny_config()
    config = config.__class__(
        dataset=config.dataset,
        model=config.model,
        loss=config.loss,
        train=config.train.__class__(batch_size=1, epochs=2),
    )
    train_ds = make_synthetic_dataset(config, n_scenes=2, anns_per_scene=5)
    val_ds = make_synthetic_dataset(
        config, n_scenes=1, anns_per_scene=3, split="val", seed=7
    )
    profile_dir = str(tmp_path / "trace")
    solver = Solver(
        config, train_ds, val_ds, str(tmp_path),
        log_every=1, profile_dir=profile_dir, profile_steps=2,
    )
    sample = next(iter(BatchIterator(train_ds, 1, epoch=0)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)

    solver(1, eval_every=1)
    # jax.profiler.trace writes plugins/profile/<ts>/*.xplane.pb
    planes = glob.glob(
        os.path.join(profile_dir, "plugins", "profile", "*", "*")
    )
    assert planes, f"no trace output under {profile_dir}"
    assert not solver._profiling

    # SIGTERM -> same save-and-exit path as KeyboardInterrupt
    def preempted_epoch(epoch):
        os.kill(os.getpid(), signal.SIGTERM)
        time.sleep(0.5)  # handler raises KeyboardInterrupt inside sleep
        raise AssertionError("SIGTERM was not delivered")

    before = signal.getsignal(signal.SIGTERM)
    solver.train_epoch = preempted_epoch
    best = solver(5, eval_every=1)  # must not propagate
    assert best is solver.best
    from vlp3d.train.checkpoint import _live_ckpt_dir

    assert os.path.exists(
        os.path.join(str(tmp_path), _live_ckpt_dir(str(tmp_path))))
    with open(os.path.join(str(tmp_path), "checkpoint_meta.json")) as f:
        assert json.load(f)["epoch"] == 0
    # the previous handler was restored on exit
    assert signal.getsignal(signal.SIGTERM) is before
    interrupts = [
        json.loads(line)
        for line in open(os.path.join(str(tmp_path), "log.jsonl"))
        if '"interrupt"' in line
    ]
    assert interrupts and interrupts[-1]["epoch"] == 0


def test_device_memory_helper(monkeypatch):
    """device_memory_mb: {} on backends without memory_stats (this CPU
    suite), populated MB fields when the device reports bytes."""
    import jax

    from vlp3d.utils import memory as mem

    out = mem.device_memory_mb()
    assert isinstance(out, dict)  # CPU/axon: {} is acceptable
    for v in out.values():
        assert v >= 0

    class FakeDev:
        def memory_stats(self):
            return {
                "bytes_in_use": 1_500_000,
                "peak_bytes_in_use": 2_000_000,
                "bytes_limit": 16_000_000_000,
                "num_allocs": 7,  # ignored
            }

    got = mem.device_memory_mb(FakeDev())
    assert got == {
        "hbm_in_use_mb": 1.5,
        "hbm_peak_mb": 2.0,
        "hbm_limit_mb": 16000.0,
    }

    class BrokenDev:
        def memory_stats(self):
            raise RuntimeError("unsupported")

    assert mem.device_memory_mb(BrokenDev()) == {}
