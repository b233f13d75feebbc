"""TB event writer round-trips through the real tensorboard reader."""

import numpy as np
import pytest


def test_scalar_events_roundtrip(tmp_path):
    from vlp3d.utils.tb_writer import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.25, 0)
    w.add_scalar("train/loss", 0.75, 1)
    w.add_scalars({"iou_rate_0.5": 0.5, "lang_acc": 0.9}, 2, prefix="val/")
    w.close()

    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    import glob

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tb.EventFileLoader(files[0]).Load())
    assert events[0].file_version == "brain.Event:2"
    def val(v):
        # the loader migrates simple_value to a DT_FLOAT tensor
        if v.WhichOneof("value") == "tensor":
            return float(v.tensor.float_val[0])
        return float(v.simple_value)

    scalars = [
        (e.step, v.tag, val(v))
        for e in events[1:]
        for v in e.summary.value
    ]
    assert (0, "train/loss", 1.25) in scalars
    assert (1, "train/loss", 0.75) in scalars
    tags = {t for _, t, _ in scalars}
    assert {"val/iou_rate_0.5", "val/lang_acc"} <= tags
    vals = {t: v for _, t, v in scalars}
    np.testing.assert_allclose(vals["val/lang_acc"], 0.9, rtol=1e-6)


def test_export_scalars_to_json(tmp_path):
    """tensorboardX-style all_scalars.json export (solver_3dvlp.py:1242)."""
    import json

    from vlp3d.utils.tb_writer import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 1.5, 0)
    w.add_scalar("loss", 1.2, 1)
    w.add_scalar("acc", 0.7, 1)
    path = w.export_scalars_to_json()
    w.close()
    with open(path) as f:
        hist = json.load(f)
    assert set(hist) == {"loss", "acc"}
    assert [e[1:] for e in hist["loss"]] == [[0, 1.5], [1, 1.2]]
    assert hist["acc"][0][1:] == [1, 0.7]


def test_wandb_writer_offline_fallback(tmp_path):
    """WandbWriter degrades to a JSONL stream when the wandb package is
    absent (this image), preserving the reference's phase-prefixed record
    shape (solver_3dvlp.py:531-565)."""
    import json
    import os

    from vlp3d.utils.wandb_writer import WandbWriter

    w = WandbWriter(str(tmp_path), config={"lr": 0.002}, enabled=True)
    w.log({"iter": 1, "train_loss": 3.5})
    w.log({"epoch": 0, "val_iou_rate_0.5": 0.1}, step=7)
    w.finish()

    path = os.path.join(str(tmp_path), "wandb_offline.jsonl")
    assert os.path.exists(path)
    with open(path) as f:
        records = [json.loads(line) for line in f]
    assert records[0] == {"_type": "config", "config": {"lr": 0.002}}
    assert records[1]["train_loss"] == 3.5
    assert records[2]["_step"] == 7

    # disabled writer: no file, no-ops
    w2 = WandbWriter(str(tmp_path / "off"), enabled=False)
    w2.log({"x": 1})
    w2.finish()
    assert not os.path.exists(str(tmp_path / "off"))
