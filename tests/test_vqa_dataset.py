"""ScanQA dataset contract test."""

import numpy as np

from vlp3d.data.tokenizer import HashTokenizer
from vlp3d.data.vqa_dataset import ScanQADataset, build_answer_vocab
from tests.test_dataset import make_scene


def test_scanqa_dataset():
    rng = np.random.default_rng(0)
    scenes = {"scene0000_00": make_scene(rng)}
    qa = [
        {
            "scene_id": "scene0000_00",
            "question_id": i,
            "question": "what color is the chair near the door",
            "answers": ["red"] if i % 2 == 0 else ["blue", "red"],
            "object_ids": [10],
            "object_names": ["chair"],
        }
        for i in range(5)
    ]
    vocab, counter = build_answer_vocab(qa)
    # alphabetical candidate order (train_qa.py:44: sorted keys)
    assert vocab == {"blue": 0, "red": 1}
    assert counter == {"red": 5, "blue": 2}

    from vlp3d.data.dataset import InMemorySceneSource

    ds = ScanQADataset(
        qa,
        InMemorySceneSource(scenes),
        HashTokenizer(),
        num_points=256,
        lang_num_max=4,
        bert_max_len=16,
    )
    item = ds[0]
    assert item["answer_cat"].shape == (4,)
    assert item["answer_cats"].shape == (4, len(vocab))
    assert item["answer_cats"].sum() > 0
    assert item["input_ids"].shape == (4, 16)

    # soft answer scores from train frequency (lib/vqa/dataset.py:36-46,
    # 195-206): red freq 5 -> 1.0; blue freq 2 -> 0.6
    scores = item["answer_cat_scores"]
    assert scores.shape == (4, len(vocab))
    red, blue = vocab["red"], vocab["blue"]
    labelled = item["answer_cats"]
    assert np.all(scores[labelled[:, red] > 0, red] == 1.0)
    two_answer_rows = labelled[:, blue] > 0
    if two_answer_rows.any():
        assert np.allclose(scores[two_answer_rows, blue], 0.6)
    # answer_cat is argmax of the multi-hot = lowest labelled index
    for j in range(4):
        assert item["answer_cat"][j] == int(np.argmax(labelled[j]))


def test_answer_score_table():
    from vlp3d.data.vqa_dataset import answer_score

    assert [answer_score(f) for f in range(6)] == [
        0.0, 0.3, 0.6, 0.9, 1.0, 1.0
    ]
