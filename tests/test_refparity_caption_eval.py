"""DIRECT parity for the caption-eval corpus/candidate helpers:
lib/joint/eval_helper.py:24-77 (prepare_corpus, decode_caption,
check_candidates, organize_candidates) vs vlp3d/eval/captioning.py.

decode_caption is the risk spot: the reference routes the whole id
sequence through the HF tokenizer's decode, which merges wordpieces
('wood ##en' -> 'wooden') and truncates after the first [SEP]; candidate
strings feed BLEU/CIDEr/ROUGE directly, so any framing drift shifts the
Scan2Cap metrics.
"""

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.data.tokenizer import BertWordPieceTokenizer
from vlp3d.eval.captioning import decode_caption, prepare_corpus

WORDS = [
    "the", "a", "wood", "##en", "chair", "table", "##s", "is", "next",
    "to", "red", ".", ",", "corner", "in",
]


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def ref_helper(torch):
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"  # DC meta assets
    import lib.joint.eval_helper as eh

    return eh


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("capvocab")
    words = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    ] + WORDS
    (tmp / "vocab.txt").write_text("\n".join(words) + "\n")
    BertTokenizer = pytest.importorskip("transformers").BertTokenizer

    return (
        BertTokenizer.from_pretrained(str(tmp)),
        BertWordPieceTokenizer(str(tmp / "vocab.txt")),
    )


def test_prepare_corpus_matches(ref_helper):
    raw = [
        {"scene_id": "s0", "object_id": "3", "object_name": "chair",
         "token": ["the", "red", "chair", "."] * 12},  # exercises max_len
        {"scene_id": "s0", "object_id": "3", "object_name": "chair",
         "token": ["a", "chair", "."]},
        {"scene_id": "s1", "object_id": "0", "object_name": "table",
         "token": ["the", "table", "."]},
    ]
    assert prepare_corpus(raw, 30) == ref_helper.prepare_corpus(raw, 30)
    assert prepare_corpus(raw, 7) == ref_helper.prepare_corpus(raw, 7)


def test_decode_caption_matches(ref_helper, tokenizers):
    hf, ours = tokenizers
    rng = np.random.default_rng(0)

    def ids_for(tokens, *, sep=True, pad=0):
        ids = [ours.cls_token_id] + [ours.vocab[t] for t in tokens]
        if sep:
            ids.append(ours.sep_token_id)
        ids += [ours.pad_token_id] * pad
        return ids

    cases = [
        ids_for(["the", "wood", "##en", "chair", "."]),  # wordpiece merge
        ids_for(["a", "table", "##s", ".", "the"], pad=3),  # pad after SEP
        ids_for(["red", "chair"], sep=False),  # missing SEP -> appended
        ids_for([]),  # empty caption
        ids_for(["in", "the", "corner", ",", "a", "chair", "."]),
        # leading continuation piece: HF's replace(' ##','') glues it
        # onto '[CLS]' itself — the candidate token becomes '[CLS]en'
        ids_for(["##en", "chair", "."]),
    ]
    for ids in cases:
        want = ref_helper.decode_caption(hf, ids)
        got = decode_caption(ours, ids)
        # HF's cleanup also glues ','; normalize whitespace on both
        assert " ".join(got.split()) == " ".join(want.split()), (
            ids, got, want
        )


def test_check_and_organize_candidates_match(ref_helper):
    corpus = {"a|1|x": ["[CLS] the chair . [SEP]"],
              "b|2|y": ["[CLS] a table . [SEP]"]}
    cands = {"b|2|y": ["[CLS] a wooden table . [SEP]"],
             "zzz|9|extra": ["[CLS] noise [SEP]"]}
    ref_filled = ref_helper.check_candidates(corpus, dict(cands))
    ref_org = ref_helper.organize_candidates(corpus, ref_filled)
    # ours fills + organizes inline at scoring time (score_captions)
    ours_filled = {k: cands.get(k, ["[CLS] [SEP]"]) for k in corpus}
    assert ours_filled == ref_org
