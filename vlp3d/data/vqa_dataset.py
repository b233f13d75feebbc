"""ScanQA dataset (question answering over ScanNet scenes).

Port of `lib/vqa/dataset.py:79-500` (ScannetQADataset) reduced to the
fields the JointNet/ScanQA training paths consume: per-question BERT
token ids, multi-answer labels against a training answer vocabulary
(answer_cat / answer_cats multi-hot / answer_cat_scores), plus the same
scene GT tensors as the joint dataset. The answer vocabulary is built from
training answers (train_qa.py:32-45).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from vlp3d.data.dataset import ScanReferJointDataset


def build_answer_vocab(qa_annotations: list, min_count: int = 1) -> dict:
    """answer string -> index, ordered by frequency then name."""
    counts = Counter()
    for q in qa_annotations:
        for a in q.get("answers", []):
            counts[a] += 1
    answers = sorted(
        (a for a, c in counts.items() if c >= min_count),
        key=lambda a: (-counts[a], a),
    )
    return {a: i for i, a in enumerate(answers)}


class ScanQADataset(ScanReferJointDataset):
    """Each chunk entry is a question; ref labels point at the question's
    linked object(s) when provided (ScanQA-style annotations carry
    object_ids/object_names lists)."""

    def __init__(self, qa_annotations, scene_source, tokenizer, *,
                 answer_vocab: dict | None = None, num_answers: int | None = None,
                 **kwargs):
        anns = []
        for q in qa_annotations:
            object_ids = q.get("object_ids") or [0]
            object_names = q.get("object_names") or ["others"]
            anns.append(
                {
                    "scene_id": q["scene_id"],
                    "object_id": str(object_ids[0]),
                    "object_name": "_".join(object_names[0].split()),
                    "ann_id": str(q.get("question_id", len(anns))),
                    "token": q["question"].split(),
                    "answers": q.get("answers", []),
                }
            )
        self.answer_vocab = answer_vocab or build_answer_vocab(anns)
        self.num_answers = num_answers or max(len(self.answer_vocab), 1)
        super().__init__(anns, scene_source, tokenizer, **kwargs)

    def __getitem__(self, idx):
        item = super().__getitem__(idx)
        chunk = self.chunks[idx]
        l = self.lang_num_max
        answer_cat = np.zeros((l,), np.int32)
        answer_cats = np.zeros((l, self.num_answers), np.float32)
        for j in range(l):
            data = chunk[min(j, len(chunk) - 1)]
            idxs = [
                self.answer_vocab[a]
                for a in data.get("answers", [])
                if a in self.answer_vocab
            ]
            if idxs:
                answer_cat[j] = idxs[0]
                answer_cats[j, idxs] = 1.0
        item["answer_cat"] = answer_cat  # (L,)
        item["answer_cats"] = answer_cats  # (L, A) multi-hot
        item["answer_cat_scores"] = answer_cats
        return item
