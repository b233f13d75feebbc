"""DIRECT VQA data parity: the reference's answer-vocabulary builder
(scripts/vqa_scripts/train.py:112-122, executed from its AST — the module
itself eagerly loads ScanQA json at import), the ScannetQADataset
answerable filter + answer-target block (lib/vqa/dataset.py:102-124,
191-210) vs vlp3d/data/vqa_dataset.py.

The answer machinery is rng-free, so every comparison here is exact:
vocabulary content under max_size/min_freq cutoffs (including the
Counter-over-sorted tie-break that decides what a truncation keeps),
train/val unanswerable filtering, multi-hot answer_cats, frequency-soft
answer_cat_scores, and the argmax answer_cat.
"""

import ast
import collections
import json
import os

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.data.dataset import InMemorySceneSource
from vlp3d.data.tokenizer import BertWordPieceTokenizer
from vlp3d.data.vqa_dataset import ScanQADataset, build_answer_vocab

from test_refparity_dataset import (
    META, TSV, SCENE, make_scene_files, write_bert_vocab,
)

QUESTIONS = [
    # (answers, object_ids, object_names, question)
    (["red", "brown"], [1], ["chair"], "what color is the chair ?"),
    (["wooden"], [3], ["desk"], "what is the desk made of ?"),
    (["brown"], [2], ["table"], "what color is the table ?"),
    (["zebra"], [4], ["counter"], "what is on the counter ?"),  # OOV-able
    (["red"], [1], ["chair"], "what color is the red chair ?"),
    (["brown", "red"], [2], ["table"], "what colors are near the table ?"),
]


def make_scanqa():
    return [
        {
            "scene_id": SCENE,
            "question_id": f"train-{k}",
            "question": q,
            "answers": ans,
            "object_ids": oids,
            "object_names": names,
        }
        for k, (ans, oids, names, q) in enumerate(QUESTIONS)
    ]


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def ref_get_answer_cands(torch):
    """Execute the reference's get_answer_cands from its AST: the module
    body of scripts/vqa_scripts/train.py json-loads ScanQA files at
    import time, so the function is lifted out and run verbatim."""
    path = "/root/reference/scripts/vqa_scripts/train.py"
    tree = ast.parse(open(path).read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "get_answer_cands"
    )
    ns = {"collections": collections}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), path, "exec"), ns)
    return ns["get_answer_cands"]


class _Args:
    def __init__(self, answer_max_size=-1, answer_min_freq=1):
        self.answer_max_size = answer_max_size
        self.answer_min_freq = answer_min_freq


@pytest.mark.parametrize("max_size,min_freq", [
    (-1, 1), (-1, 2), (3, 1), (2, 1), (4, 2),
])
def test_answer_vocab_builder_matches(ref_get_answer_cands, max_size,
                                      min_freq):
    """Tie-heavy corpus: several answers share frequencies, so the
    max_size truncation depends on the reference's Counter-over-sorted
    alphabetical tie-break."""
    train = [
        {"answers": ["red", "blue"]},
        {"answers": ["blue", "apple"]},
        {"answers": ["zebra"]},
        {"answers": ["mango", "red"]},
        {"answers": ["apple"]},
    ]
    cands, counter = ref_get_answer_cands(
        _Args(max_size, min_freq), {"train": train}
    )
    vocab, ours_counter = build_answer_vocab(
        train, min_count=min_freq, max_size=max_size
    )
    assert sorted(vocab, key=vocab.get) == cands
    assert ours_counter == counter


@pytest.fixture(scope="module")
def env(torch, tmp_path_factory, ref_get_answer_cands):
    tmp = tmp_path_factory.mktemp("refvqa")
    scannet_data = tmp / "scannet_data"
    bert_dir = tmp / "bert"
    scannet_data.mkdir()
    bert_dir.mkdir()
    # reuse the joint fixture's scene + add the QA words to the vocab
    write_bert_vocab(bert_dir / "vocab.txt")
    with open(bert_dir / "vocab.txt", "a") as f:
        f.write("what\ncolor\nmade\ncolors\nare\n?\n")
    scene = make_scene_files(
        str(scannet_data), np.random.default_rng(11), include_id0=False
    )

    from lib.configs.config import CONF as BASE_CONF

    BASE_CONF.PATH.SCANNET = "/root/reference/data/scannet"
    # lib/configs/config_vqa.py:38 eagerly json-loads a CWD-relative
    # scan_list.json at import; satisfy it from the sandbox
    scan_list = tmp / "data/ScanQa/data/scannet/meta_data/scan_list.json"
    scan_list.parent.mkdir(parents=True)
    scan_list.write_text("[]")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        import lib.vqa.dataset as refvqa
    finally:
        os.chdir(cwd)

    refvqa.SCANNET_V2_TSV = TSV
    refvqa.CONF.PATH.SCANNET_META = META
    refvqa.CONF.PATH.SCANNET_DATA = str(scannet_data)

    BertTokenizer = pytest.importorskip("transformers").BertTokenizer

    hf_tok = BertTokenizer.from_pretrained(str(bert_dir))
    scanqa = make_scanqa()
    cands, counter = ref_get_answer_cands(_Args(), {"train": scanqa})

    def make_ref(split="train", **kw):
        import copy

        return refvqa.ScannetQADataset(
            scanqa=copy.deepcopy(scanqa),
            scanqa_all_scene=[SCENE],
            answer_cands=cands,
            answer_counter=counter,
            answer_cls_loss="bce",  # emits answer_cat_scores
            split=split,
            num_points=1024,
            tokenizer=hf_tok,
            **kw,
        )

    def make_ours(split="train", **kw):
        vocab, ours_counter = build_answer_vocab(scanqa)
        return ScanQADataset(
            make_scanqa(),
            InMemorySceneSource({SCENE: scene}),
            BertWordPieceTokenizer(str(bert_dir / "vocab.txt")),
            answer_vocab=vocab,
            answer_counter=ours_counter,
            num_answers=len(vocab),
            split=split,
            num_points=1024,
            lang_num_max=1,  # one question per item, like the reference
            use_height=True,
            seed=7,
            **kw,
        )

    return make_ref, make_ours, cands


def test_answerable_filtering(env):
    """Every fixture answer is in the full vocab (min_freq=1), so the
    default split keeps all 6; with a restricted vocab the reference's
    rule (set-intersection with answer_cands, dataset.py:102-124) drops
    the zebra/wooden-only questions from train and val."""
    make_ref, make_ours, cands = env
    assert len(make_ref(split="train")) == len(make_ours(split="train")) == 6

    small = {"red": 3, "brown": 3}
    import lib.vqa.dataset as refvqa

    ref_small = refvqa.ScannetQADataset(
        scanqa=make_scanqa(), scanqa_all_scene=[SCENE],
        answer_cands=sorted(small), answer_counter=small,
        split="val", num_points=1024,
        tokenizer=lambda q, return_tensors=None: {
            "input_ids": np.zeros((1, 4), np.int64),
            "attention_mask": np.ones((1, 4), np.int64),
        },
    )
    ours_small = ScanQADataset(
        make_scanqa(), InMemorySceneSource({}),
        lambda t, max_length=50: None,
        answer_vocab={a: i for i, a in enumerate(sorted(small))},
        answer_counter=small, split="val", lang_num_max=1,
    )
    assert ours_small.all_data_size == 6
    assert ours_small.answerable_data_size == len(ref_small) == 4


def test_answer_targets_match(env):
    make_ref, make_ours, cands = env
    ref_ds = make_ref()
    our_ds = make_ours()
    assert len(ref_ds) == len(our_ds) == 6
    for idx in range(6):
        ref_item = ref_ds[idx]
        our_item = our_ds[idx]
        # our answer dim order is the same sorted candidate list
        np.testing.assert_array_equal(
            np.asarray(our_item["answer_cats"][0]),
            np.asarray(ref_item["answer_cats"]),
            err_msg=f"idx{idx}:answer_cats",
        )
        np.testing.assert_allclose(
            np.asarray(our_item["answer_cat_scores"][0]),
            np.asarray(ref_item["answer_cat_scores"]),
            rtol=0, atol=0, err_msg=f"idx{idx}:answer_cat_scores",
        )
        assert int(our_item["answer_cat"][0]) == int(ref_item["answer_cat"])
