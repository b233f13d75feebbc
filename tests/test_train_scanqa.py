"""Standalone ScanQA training pipeline (scripts/vqa_scripts/train.py +
lib/vqa/solver.py): end-to-end smoke through the CLI main()."""

import json
import os

import pytest


@pytest.mark.slow
def test_train_scanqa_smoke(tmp_path):
    from vlp3d.cli.train_scanqa import main

    best = main([
        "--smoke", "--output_dir", str(tmp_path), "--seed", "7",
    ])
    assert 0.0 <= best["answer_acc_1"] <= 1.0
    assert best["answer_acc_10"] >= best["answer_acc_1"]
    runs = os.listdir(tmp_path)
    assert len(runs) == 1
    run = os.path.join(tmp_path, runs[0])
    assert os.path.exists(os.path.join(run, "model_last"))
    with open(os.path.join(run, "best.json")) as f:
        assert json.load(f)["answer_acc_1"] == best["answer_acc_1"]
    with open(os.path.join(run, "log.jsonl")) as f:
        phases = {json.loads(line)["phase"] for line in f}
    assert phases == {"train", "val"}


def test_scanqa_dataset_glove_fields():
    """ScanQADataset with a glove dict attaches the LSTM language fields
    (lang_feat/lang_len/...) alongside the joint input_ids."""
    import numpy as np

    from vlp3d.cli.train_scanqa import _squeeze_l, _synthetic_qa
    from vlp3d.data.synthetic import tiny_config
    from vlp3d.data.tokenizer import HashTokenizer
    from vlp3d.data.vqa_dataset import ScanQADataset

    config = tiny_config()
    qa, source, glove = _synthetic_qa(config)
    ds = ScanQADataset(
        qa, source, HashTokenizer(), split="train",
        num_points=config.dataset.num_points, lang_num_max=1,
        bert_max_len=config.model.bert_seq_len,
        mean_size_arr=config.dataset.mean_size_arr(),
        glove=glove, raw2label={},
    )
    item = ds[0]
    assert item["lang_feat"].shape == (1, 30, 300)
    assert item["lang_len"].shape == (1,)
    assert int(item["lang_len"][0]) > 0
    assert np.abs(item["lang_feat"]).sum() > 0
    assert "input_ids" in item  # joint-path fields still present
    sq = _squeeze_l({k: v[None] for k, v in item.items()
                     if not isinstance(v, (list, str))})
    assert sq["lang_feat"].shape == (1, 30, 300)
    assert sq["object_cat"].shape == (1,)
