"""Legacy 3DJCG single-task grounding pipeline (RefNet + GloVe LSTM):
end-to-end smoke through the CLI main()."""

import json
import os

import pytest


@pytest.mark.slow
def test_train_3djcg_g_smoke(tmp_path):
    from vlp3d.cli.train_3djcg_g import main

    best = main(["--smoke", "--output_dir", str(tmp_path)])
    assert 0.0 <= best["iou_rate_0.25"] <= 1.0
    run = os.path.join(tmp_path, os.listdir(tmp_path)[0])
    assert os.path.exists(os.path.join(run, "model_last"))
    with open(os.path.join(run, "log.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    phases = {r["phase"] for r in recs}
    assert phases == {"train", "val"}
    train_recs = [r for r in recs if r["phase"] == "train"]
    import numpy as np
    assert all(np.isfinite(r["loss"]) for r in train_recs)
    assert any("ref_loss" in r for r in train_recs)


@pytest.mark.slow
def test_train_3djcg_c_smoke(tmp_path):
    """Legacy captioning pipeline (CapNet + caption vocab ids)."""
    from vlp3d.cli.train_3djcg_c import main

    best = main(["--smoke", "--output_dir", str(tmp_path)])
    assert 0.0 <= best["cap_acc"] <= 1.0
    run = os.path.join(tmp_path, os.listdir(tmp_path)[0])
    assert os.path.exists(os.path.join(run, "model_last"))
    assert os.path.exists(os.path.join(run, "caption_model"))
    with open(os.path.join(run, "log.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert {r["phase"] for r in recs} == {"train", "val"}
    import numpy as np
    assert all(np.isfinite(r["cap_loss"]) for r in recs)
