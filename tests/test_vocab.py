"""Caption vocabulary/frequency builder contract (dataset.py:294-358)."""

import json

import numpy as np

from vlp3d.data.vocab import (
    SPECIAL_WORDS,
    build_caption_frequency,
    build_caption_vocabulary,
)


def test_vocabulary_layout_and_cache(tmp_path):
    anns = [
        {"token": ["the", "red", "chair", "near", "the", "door"]},
        {"token": ["the", "chair", "is", "red"]},
        {"token": ["a", "pad", "on", "the", "chair"]},
    ]
    vp = str(tmp_path / "vocab.json")
    vocab = build_caption_vocabulary(anns, vocab_path=vp)

    w2i = vocab["word2idx"]
    # specials occupy 0-3 with the reference's "pad_" spelling
    assert [w2i[w] for w in SPECIAL_WORDS] == [0, 1, 2, 3]
    # most frequent word first after specials: "the" (x5), then "chair"/"red"
    assert w2i["the"] == 4
    assert w2i["chair"] == 5
    # the actual word "pad" is distinct from the padding token "pad_"
    assert "pad" in w2i and w2i["pad"] != w2i["pad_"]
    # idx2word inverts word2idx
    assert vocab["idx2word"][str(w2i["red"])] == "red"

    # json cache round-trips and short-circuits the rebuild
    cached = build_caption_vocabulary([], vocab_path=vp)
    assert cached["word2idx"] == {k: v for k, v in json.load(open(vp))["word2idx"].items()}

    # glove-style filter drops unknown words
    filtered = build_caption_vocabulary(anns, known_words={"the", "chair"})
    assert "red" not in filtered["word2idx"]
    assert "chair" in filtered["word2idx"]


def test_frequency_uniform(tmp_path):
    vocab = build_caption_vocabulary([{"token": ["a", "b"]}])
    wp = str(tmp_path / "weights.json")
    w = build_caption_frequency(vocab, weights_path=wp)
    assert w.shape == (len(vocab["word2idx"]),)
    np.testing.assert_array_equal(w, 1.0)
    # cache round-trip
    w2 = build_caption_frequency(vocab, weights_path=wp)
    np.testing.assert_array_equal(w2, w)
