"""Joint ScanQA training path (scripts/joint_scripts/train_qa.py +
lib/vqa/solver.py): JointNet(use_answer) over ScanQA-style annotations,
answer EM@1/@10 val metrics, best-model keyed on answer_acc_at1."""

import json
import os

import pytest


@pytest.mark.slow
def test_train_qa_smoke(tmp_path):
    from vlp3d.cli.train_qa import main

    best = main(["--smoke", "--output_dir", str(tmp_path), "--seed", "3"])
    assert 0.0 <= best["answer_acc_at1"] <= 1.0
    assert best["answer_acc_at10"] >= best["answer_acc_at1"]
    # best-model selection keyed on answer_acc_at1
    # (lib/vqa/solver.py:120,503-506)
    assert best["sum"] == best["answer_acc_at1"]

    runs = os.listdir(tmp_path)
    assert len(runs) == 1
    run = os.path.join(tmp_path, runs[0])
    with open(os.path.join(run, "info.json")) as f:
        info = json.load(f)
    assert info["num_answers"] >= 1
    # the vocabulary is the sorted set of training answers
    # (train_qa.py:32-45: most_common capped, min-freq filtered, sorted)
    assert os.path.exists(os.path.join(run, "model_last"))
    with open(os.path.join(run, "log.jsonl")) as f:
        records = [json.loads(line) for line in f]
    val = [r for r in records if r["phase"] == "val"]
    assert val and "answer_acc_at1" in val[-1]


def test_answer_vocab_min_freq_and_cap():
    from vlp3d.data.vqa_dataset import build_answer_vocab

    qa = (
        [{"answers": ["red"]}] * 4
        + [{"answers": ["blue"]}] * 2
        + [{"answers": ["one"]}]
    )
    vocab, counter = build_answer_vocab(qa, min_count=2)
    assert set(vocab) == {"red", "blue"}
    assert counter == {"red": 4, "blue": 2}
    vocab, _ = build_answer_vocab(qa, min_count=1, max_size=1)
    assert set(vocab) == {"red"}
