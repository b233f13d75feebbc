"""DIRECT data-layer parity: the reference's ScannetReferenceDataset
(lib/joint/dataset.py:425-920) run as the oracle vs ScanReferJointDataset,
item for item, on a synthetic scene written in the reference's on-disk
format (scene npys + ScanRefer annotations + meta tsv).

This is the strongest remaining accuracy-parity surface: every training
batch flows through this code, and the earlier evidence was structural
contract tests only. The rng seam makes value-exact comparison possible:
both datasets draw point-sampling (and augmentation) randomness from a
np.random Generator with IDENTICAL call sequences — reference
dataset.py:611-613 `rng.choice(N, num_points, replace)` then
flip(2 draws)/rotate(3)/scale(9+3) in utils/utils_fn.py:28-142, mirrored
by vlp3d/data/augment.py — so injecting the same Generator into the
oracle instance (`ref_ds.rng = np.random.default_rng(key)`) yields the
same sampled indices and augmentation parameters as our counter-based
per-item stream with the same key.

Compared keys cover the full live-model batch contract: sampled points,
height channel, votes + mask, GT box tensors, per-sentence ref label
lists, corner tensors, category/unique-multiple lookups, and the BERT
tokenization. (`lang_len_list`/`lang_ids` feed only the legacy capnet /
GloVe paths, covered by tests/test_glove.py; `contrast_mask` feeds only
the dormant positive-match loss, see losses/pretrain.py.)
"""

import json
import os
import sys

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.data.dataset import (
    InMemorySceneSource,
    ScanReferJointDataset,
    load_raw2label,
    build_nyu40id2class,
)
from vlp3d import native
from vlp3d.data.tokenizer import BertWordPieceTokenizer

TSV = "/root/reference/data/scannet/meta_data/scannetv2-labels.combined.tsv"
META = "/root/reference/data/scannet/meta_data"
SCENE = "scene0000_00"
NUM_POINTS = 1024
LANG_NUM_MAX = 4
SEED = 42

WORDS = [
    "the", "red", "chair", "is", "next", "to", "table", "a", "on",
    "left", "of", "brown", "wooden", "desk", "counter", "it", "near",
    "door", ".", ",",
]

# objects 1 and 5 are both chairs -> unique_multiple must be 1 for them
# (0 for the single-instance classes); exercises the real lookup, not
# just its 0 default
ANNS = [
    ("1", "chair", "the red chair is next to the table ."),
    ("1", "chair", "a wooden chair near the door ."),
    ("2", "table", "the brown table on the left of the desk ."),
    ("3", "desk", "a wooden desk near the door ."),
    ("4", "counter", "the counter is next to the table ."),
    ("2", "table", "a brown table , it is near the chair ."),
    ("5", "chair", "the chair near the counter ."),
]


def write_bert_vocab(path):
    words = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
        "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    ] + WORDS
    with open(path, "w") as f:
        f.write("\n".join(words) + "\n")


def make_scene_files(root, rng, include_id0=True):
    """One scene in the reference's preprocessed on-disk layout.

    5 objects with nyu40 sem ids from DC.nyu40ids plus one id-0 filler
    box (pinning the `DC.nyu40id2class[0] = 0` benchmark quirk,
    dataset.py:681) and one instance whose per-point semantic label (1 =
    wall) is OUTSIDE nyu40ids so its votes are gated off while its bbox
    row stays valid."""
    n, n_obj = 3000, 5
    pts = rng.uniform(0, 5, (n, 3)).astype(np.float32)
    ins = np.zeros(n, np.int64)
    sem = np.ones(n, np.int64)  # background: wall (gated off)
    bboxes = np.zeros((n_obj + 1, 8), np.float64)
    nyu_ids = [3, 4, 5, 6, 39]
    per = n // (2 * n_obj)
    for i in range(n_obj):
        # f32-representable box params so the reference's f64 label math
        # and our f32 path round identically at the final f32 cast
        c = rng.uniform(1, 4, 3).astype(np.float32)
        s = rng.uniform(0.5, 1.0, 3).astype(np.float32)
        sl = slice(i * per, (i + 1) * per)
        pts[sl] = (c + rng.uniform(-0.5, 0.5, (per, 3)) * s).astype(
            np.float32
        )
        ins[sl] = i + 1
        # object 4 (id 5): points labelled wall -> vote mask 0
        sem[sl] = 1 if i == 4 else nyu_ids[i]
        bboxes[i, 0:3] = c
        bboxes[i, 3:6] = s
        bboxes[i, 6] = nyu_ids[i]
        bboxes[i, 7] = i + 1  # object id
    if include_id0:
        bboxes[n_obj] = [2.0, 2.0, 1.0, 0.5, 0.5, 0.5, 0.0, 99.0]  # id-0
    else:
        # the VQA reference has no nyu40id2class[0] injection
        # (lib/vqa/dataset.py:378 would KeyError); drop the filler box
        bboxes = bboxes[:n_obj]
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    np.save(os.path.join(root, SCENE + "_aligned_vert.npy"),
            np.concatenate([pts, color], axis=1))
    np.save(os.path.join(root, SCENE + "_ins_label.npy"), ins)
    np.save(os.path.join(root, SCENE + "_sem_label.npy"), sem)
    np.save(os.path.join(root, SCENE + "_aligned_bbox.npy"), bboxes)
    for split in ("train", "val"):
        np.save(os.path.join(root, SCENE + f"_preprocess_{split}.npy"), pts)
        np.save(os.path.join(root, SCENE + f"_pcl_color_{split}.npy"), color)
    return {
        "point_cloud": pts,
        "instance_labels": ins,
        "semantic_labels": sem,
        "instance_bboxes": bboxes.astype(np.float32),
    }


def make_scanrefer():
    return [
        {
            "scene_id": SCENE,
            "object_id": oid,
            "object_name": name,
            "ann_id": str(k),
            "token": text.split(),
        }
        for k, (oid, name, text) in enumerate(ANNS)
    ]


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def env(torch, tmp_path_factory):
    """Reference + our dataset over the same synthetic scene."""
    tmp = tmp_path_factory.mktemp("refdataset")
    scannet_data = tmp / "scannet_data"
    bert_dir = tmp / "bert"
    scannet_data.mkdir()
    bert_dir.mkdir()
    write_bert_vocab(bert_dir / "vocab.txt")

    # caption vocabulary (pre-written: the builder path needs self.glove,
    # which the reference itself has commented out, dataset.py:363)
    spw = ["pad_", "unk", "sos", "eos"]
    word2idx = {w: i for i, w in enumerate(spw)}
    for w in WORDS:
        word2idx.setdefault(w, len(word2idx))
    vocab = {
        "word2idx": word2idx,
        "idx2word": {str(v): k for k, v in word2idx.items()},
    }
    with open(tmp / "ScanRefer_vocabulary.json", "w") as f:
        json.dump(vocab, f)

    # point model_util_scannet's CONF at the checkout's real meta assets,
    # then import the reference dataset module and repoint its path
    # globals at the sandbox (robust against prior imports)
    from lib.configs.config import CONF as BASE_CONF

    BASE_CONF.PATH.SCANNET = "/root/reference/data/scannet"
    import lib.joint.dataset as refds

    refds.SCANNET_V2_TSV = TSV
    refds.VOCAB = str(tmp / "{}_vocabulary.json")
    refds.VOCAB_WEIGHTS = str(tmp / "{}_vocabulary_weights.json")
    refds.CONF.PATH.DATA = str(tmp)
    refds.CONF.PATH.SCANNET_META = META
    refds.CONF.PATH.SCANNET_DATA = str(scannet_data)
    refds.CONF.BERT_TEXT_ENCODER = str(bert_dir)

    scene = make_scene_files(str(scannet_data), np.random.default_rng(11))
    scanrefer = make_scanrefer()

    def make_ref(chunk_cap=LANG_NUM_MAX, split="train", **kw):
        ds = refds.ScannetReferenceDataset(
            scanrefer=scanrefer,
            scanrefer_new=[
                scanrefer[i: i + chunk_cap]
                for i in range(0, len(scanrefer), chunk_cap)
            ],
            scanrefer_all_scene=[SCENE],
            split=split,
            name="ScanRefer",
            num_points=NUM_POINTS,
            lang_num_max=LANG_NUM_MAX,
            use_height=True,
            seed=SEED,
            **kw,
        )
        # populate scanrefer_dict (the prompt-augmentation pool); the
        # reference train script routes scanrefer through
        # split_scene_new, which fills it as a side effect
        ds.split_scene_new(scanrefer)
        return ds

    def make_ours(split="train", **kw):
        return ScanReferJointDataset(
            scanrefer,
            InMemorySceneSource({SCENE: scene}),
            BertWordPieceTokenizer(str(bert_dir / "vocab.txt")),
            split=split,
            num_points=NUM_POINTS,
            lang_num_max=LANG_NUM_MAX,
            use_height=True,
            mean_size_arr=refds.DC.mean_size_arr.astype(np.float32),
            raw2label=load_raw2label(TSV),
            nyu40id2class=build_nyu40id2class(TSV),
            bert_max_len=50,
            seed=SEED,
            **kw,
        )

    return refds, make_ref, make_ours


# exact-integer keys and float keys with their comparison tolerance
EXACT = [
    "instance_labels", "vote_label_mask", "heading_class_label",
    "size_class_label", "num_bbox", "sem_cls_label", "gt_box_masks",
    "gt_box_object_ids", "ref_box_label_list",
    "ref_heading_class_label_list", "ref_heading_residual_label_list",
    "ref_size_class_label_list", "object_id_list", "ann_id_list",
    "object_cat_list", "unique_multiple_list", "lang_num",
]
# size residuals / corners involve the mean-size table: our pipeline
# subtracts in f32 while the reference runs f64 end-to-end and rounds
# once at the final cast — a 1-ulp (~1.2e-7) difference by construction.
FLOAT = [
    ("point_clouds", 0.0),
    ("vote_label", 0.0),
    ("center_label", 0.0),
    ("heading_residual_label", 0.0),
    ("size_residual_label", 2.5e-7),
    ("box_label_mask", 0.0),
    ("ref_center_label_list", 0.0),
    ("ref_size_residual_label_list", 2.5e-7),
    ("ref_box_corner_label_list", 1e-6),
    ("gt_box_corner_label", 1e-6),
]


def item_key(idx):
    return (SEED, 0, idx)


def compare_items(ref_item, our_item, *, label, float_atol=None):
    """float_atol overrides every FLOAT tolerance (augment case: our
    host path rounds to f32 after each augmentation step while the
    reference does all math in f64 and rounds once — a few-ulp drift on
    values ~5 m; the rng draws themselves are identical, so every
    integer output must still be EXACT)."""
    for k in EXACT:
        r = np.asarray(ref_item[k])
        o = np.asarray(our_item[k])
        assert r.shape == o.shape, f"{label}:{k} shape {r.shape} vs {o.shape}"
        np.testing.assert_array_equal(
            o.astype(np.int64), r.astype(np.int64), err_msg=f"{label}:{k}"
        )
    for k, atol in FLOAT:
        if float_atol is not None:
            atol = float_atol
        r = np.asarray(ref_item[k], np.float64)
        o = np.asarray(our_item[k], np.float64)
        assert r.shape == o.shape, f"{label}:{k} shape {r.shape} vs {o.shape}"
        np.testing.assert_allclose(
            o, r, rtol=0, atol=atol, err_msg=f"{label}:{k}"
        )
    # tokenization: HF BertTokenizer vs our WordPiece
    np.testing.assert_array_equal(
        np.asarray(our_item["input_ids"], np.int64),
        ref_item["input_ids"].numpy().astype(np.int64),
        err_msg=f"{label}:input_ids",
    )
    np.testing.assert_array_equal(
        np.asarray(our_item["bert_attention_mask"], np.int64),
        ref_item["bert_attention_mask"].numpy().astype(np.int64),
        err_msg=f"{label}:attention_mask",
    )


@pytest.mark.parametrize("fused", [True, False], ids=["fused", "numpy"])
@pytest.mark.parametrize("augment,split", [
    (False, "train"), (True, "train"), (False, "val"),
], ids=["plain", "augment", "val"])
def test_item_parity(env, monkeypatch, fused, augment, split):
    refds, make_ref, make_ours = env
    if fused and not native.native_available():
        pytest.skip("native loader unavailable")
    if not fused:
        monkeypatch.setattr(native, "native_available", lambda: False)

    ref_ds = make_ref(augment=augment, split=split)
    our_ds = make_ours(augment=augment, split=split)
    assert len(ref_ds) == len(our_ds) == 2

    for idx in range(2):
        # same Generator key as our counter-based per-item stream
        ref_ds.rng = np.random.default_rng(item_key(idx))
        ref_item = ref_ds[idx]
        our_item = our_ds[idx]
        compare_items(ref_item, our_item,
                      label=f"idx{idx}/aug{int(augment)}",
                      float_atol=2e-5 if augment else None)


def test_item_parity_minor_aug(env):
    """minor_aug slot duplication (dataset.py:561-589): a sentence about
    a minor-class object ('counter', chunk 2 slot 0) is repeated into the
    following slot, shifting the later annotations. Draws no extra rng,
    so the comparison is value-exact."""
    refds, make_ref, make_ours = env
    ref_ds = make_ref(minor_aug=True)
    our_ds = make_ours(minor_aug=True)
    for idx in range(2):
        ref_ds.rng = np.random.default_rng(item_key(idx))
        ref_item = ref_ds[idx]
        compare_items(ref_item, our_ds[idx], label=f"minor/idx{idx}")
    # chunk 2 is [counter, table, chair]: the repeat must have happened
    oids = np.asarray(ref_item["object_id_list"])
    assert oids[0] == oids[1] == 4  # counter object repeated


def test_item_parity_prompt_aug(env):
    """lang_num_aug=1 prompt augmentation: the aug slot's target/anchor
    selection draws from the dataset rng (shared seam, dataset.py:694-699)
    but the prompt TEXT draws from global random/np.random in the
    reference (lib/prompt/prompt.py:33-48) — so every key except the aug
    slot's tokenization compares exactly, and that slot's ids/cats (which
    depend only on the shared choice) must still match, including the
    'first annotation' ann_id quirk (dataset.py:718-719)."""
    refds, make_ref, make_ours = env
    cap = LANG_NUM_MAX - 1
    ref_ds = make_ref(chunk_cap=cap, lang_num_aug=1, augment=True)
    our_ds = make_ours(lang_num_aug=1, augment=True)
    assert len(ref_ds) == len(our_ds) == 3
    for idx in range(3):
        ref_ds.rng = np.random.default_rng(item_key(idx))
        ref_item = ref_ds[idx]
        our_item = dict(our_ds[idx])
        # mask out the aug slot's tokenization before the full compare
        for k in ("input_ids", "bert_attention_mask"):
            r = np.array(np.asarray(ref_item[k]))
            o = np.array(our_item[k])
            np.testing.assert_array_equal(
                o[:cap], r[:cap], err_msg=f"promptaug/idx{idx}:{k}"
            )
            our_item[k] = np.asarray(ref_item[k])
        compare_items(ref_item, our_item, label=f"promptaug/idx{idx}",
                      float_atol=2e-5)


def test_raw2label_and_class_maps_match(env):
    """The lookup tables themselves, not just their effects."""
    refds, make_ref, _ = env
    ref_ds = make_ref()
    ours = load_raw2label(TSV)
    assert ours == ref_ds.raw2label
    # the reference injects {0: 0} at item time (dataset.py:681) while
    # our builder bakes it in; compare the rest
    ref_map = {k: v for k, v in refds.DC.nyu40id2class.items() if k != 0}
    our_map = {k: v for k, v in build_nyu40id2class(TSV).items() if k != 0}
    assert our_map == ref_map


def test_unique_multiple_lookup_matches(env):
    from vlp3d.data.dataset import unique_multiple_lookup

    refds, make_ref, _ = env
    ref_ds = make_ref()
    ours = unique_multiple_lookup(make_scanrefer(), load_raw2label(TSV))
    # reference keys ann_id by str; ours by the values the item path reads
    values = set()
    for scene_id, objs in ref_ds.unique_multiple_lookup.items():
        for oid, anns in objs.items():
            for ann_id, v in anns.items():
                assert ours[scene_id][oid][int(ann_id)] == v
                values.add(v)
    # the fixture must exercise BOTH outcomes, or a lookup that always
    # misses to its 0 default would pass vacuously
    assert values == {0, 1}
