"""WordPiece tokenizer golden tests against a constructed vocab."""

import numpy as np

from vlp3d.data.tokenizer import BertWordPieceTokenizer, basic_tokenize


def make_vocab(tmp_path):
    # ids follow bert-base-uncased special layout: PAD=0, UNK=100, CLS=101,
    # SEP=102, MASK=103
    words = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    ]
    words += ["the", "red", "chair", "is", "next", "to", "table", "##s",
              "un", "##afford", "##able", "."]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(words) + "\n")
    return str(path)


def test_basic_tokenize():
    assert basic_tokenize("The red-Chair.") == ["the", "red", "-", "chair", "."]
    assert basic_tokenize("Café") == ["cafe"]  # accent strip


def test_wordpiece(tmp_path):
    tok = BertWordPieceTokenizer(make_vocab(tmp_path))
    assert tok.vocab["the"] == 104
    # greedy longest match with ## continuation
    ids = tok.tokenize_ids("unaffordable")
    assert [tok.inv_vocab[i] for i in ids] == ["un", "##afford", "##able"]
    # plural via ##s
    ids = tok.tokenize_ids("chairs")
    assert [tok.inv_vocab[i] for i in ids] == ["chair", "##s"]
    # unknown word -> UNK
    assert tok.tokenize_ids("zebra") == [100]


def test_encode_frame(tmp_path):
    tok = BertWordPieceTokenizer(make_vocab(tmp_path))
    out = tok(["the red chair is next to the table"], max_length=12)
    ids = out["input_ids"][0]
    assert ids[0] == 101  # CLS
    sep = int(np.where(ids == 102)[0][0])
    assert (out["attention_mask"][0][: sep + 1] == 1).all()
    assert (ids[sep + 1 :] == 0).all()
    # roundtrip
    assert tok.decode(ids) == "the red chair is next to the table"


def test_truncation(tmp_path):
    tok = BertWordPieceTokenizer(make_vocab(tmp_path))
    out = tok(["the " * 50], max_length=8)
    assert out["input_ids"].shape == (1, 8)
    assert out["attention_mask"][0].sum() == 8  # CLS + 6 tokens + SEP
