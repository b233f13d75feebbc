"""GloVe-era description transform (lib/visual_grounding/dataset.py:457-535)."""

import numpy as np

from vlp3d.data.glove import (
    glove_batch_fields,
    synthetic_glove,
    transform_description,
    transform_descriptions,
)


def test_transform_description_semantics():
    glove = synthetic_glove(
        ["the", "brown", "chair", "near", "desk", "office", "."], dim=8
    )
    raw2label = {"chair": 2, "office chair": 2, "desk": 10}
    tokens = "the brown office chair . near the desk".split()

    f = transform_description(tokens, "chair", glove, raw2label, max_des_len=10)
    # glove[token] with pad fallback ("office" missing -> pad? no, present)
    np.testing.assert_array_equal(f["embeddings"][0], glove["the"])
    # unknown word -> pad in full embeddings
    f2 = transform_description(["zzz"], "chair", glove, raw2label, 4)
    np.testing.assert_array_equal(f2["embeddings"][0], glove["pad"])
    # ...but unk in the main-clause embeddings
    np.testing.assert_array_equal(f2["main_embeddings"][0], glove["unk"])

    # main clause ends at the first "."
    assert f["main_len"] == 5
    assert np.allclose(f["main_embeddings"][5:], 0.0)
    assert not np.allclose(f["main_embeddings"][:5], 0.0)

    # first_obj: "office chair" two-word match points at the SECOND word
    assert f["first_obj"] == 3
    assert f["lang_len"] == 8

    # no "." -> main_len = full token count
    f3 = transform_description(["the", "desk"], "desk", glove, raw2label, 6)
    assert f3["main_len"] == 2
    assert f3["first_obj"] == 1


def test_batch_fields_shapes():
    glove = synthetic_glove(["a", "chair", "."], dim=8)
    anns = [
        {
            "scene_id": "s0",
            "object_id": "3",
            "ann_id": str(i),
            "object_name": "chair",
            "token": ["a", "chair", "."],
        }
        for i in range(3)
    ]
    lang = transform_descriptions(anns, glove, {"chair": 2}, max_des_len=6)
    fields = glove_batch_fields(anns, lang, lang_num_max=4, max_des_len=6)
    assert fields["lang_feat"].shape == (4, 6, 8)
    assert fields["lang_len"].tolist() == [3, 3, 3, 3]  # padded by repeat
    assert fields["first_obj"].tolist() == [1, 1, 1, 1]
