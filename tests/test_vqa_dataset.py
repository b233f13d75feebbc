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
    vocab = build_answer_vocab(qa)
    assert vocab["red"] == 0  # most frequent

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
