"""Fused native loader path vs the numpy item path.

The fused path (native row gather into preallocated batch slots + narrow
f64 augment replay + in-place tiled votes) must produce BIT-IDENTICAL
items to the numpy path for the same per-item rng stream — every float
is rounded at the same points (single f32 round after the f64 augment
chain; f32 vote arithmetic identical to native.compute_votes).
"""

import numpy as np
import pytest

from vlp3d import native
from vlp3d.data.dataset import BatchIterator, collate
from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C compiler"
)


def _dataset(augment, *, ifd=None, n_points=3000, num_points=None,
             split="train"):
    import dataclasses

    config = tiny_config()
    if ifd is not None:
        config = dataclasses.replace(
            config, model=dataclasses.replace(config.model,
                                              input_feature_dim=ifd)
        )
    if num_points is not None:
        config = dataclasses.replace(
            config, dataset=dataclasses.replace(config.dataset,
                                                num_points=num_points)
        )
    return make_synthetic_dataset(
        config, n_scenes=3, n_points=n_points, anns_per_scene=7,
        augment=augment, split=split, seed=3,
    )


def _numpy_item(ds, idx):
    """Force the numpy fallback path for the same rng stream."""
    avail = native.native_available
    try:
        native.native_available = lambda: False
        return ds[idx]
    finally:
        native.native_available = avail


@pytest.mark.parametrize("augment", [False, True])
@pytest.mark.parametrize("ifd", [1, 132])  # height-only vs multiview-like
def test_fused_item_bitexact(augment, ifd):
    ds = _dataset(augment, ifd=ifd)
    for idx in (0, 1, len(ds) - 1):
        fused = ds[idx]
        ref = _numpy_item(ds, idx)
        assert set(fused) == set(ref)
        for k in ref:
            if isinstance(ref[k], (list, str)):
                assert fused[k] == ref[k], k
                continue
            a, b = np.asarray(fused[k]), np.asarray(ref[k])
            assert a.shape == b.shape, k
            assert np.array_equal(a, b), (
                f"{k}: max abs diff "
                f"{np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))}"
            )
        # vote-mask dtype is the collate contract (int64)
        assert fused["vote_label_mask"].dtype == np.int64
        assert fused["point_clouds"].dtype == np.float32


def test_fused_item_replace_sampling():
    """Scene smaller than num_points -> replace=True choice stream."""
    ds = _dataset(True, ifd=1, n_points=150, num_points=512)
    fused, ref = ds[0], _numpy_item(ds, 0)
    for k in ("point_clouds", "vote_label", "vote_label_mask",
              "instance_labels", "center_label"):
        assert np.array_equal(np.asarray(fused[k]), np.asarray(ref[k])), k


def test_direct_write_batch_matches_collate():
    """BatchIterator's preallocated direct-write batches == stacking
    full __getitem__ items."""
    ds = _dataset(True, ifd=132)
    it = BatchIterator(ds, 2, epoch=0, rng=np.random.default_rng(7))
    batches = list(it)
    gates = [float(np.random.default_rng(7).random())]
    items01 = [ds[0], ds[1]]
    want = collate(items01, random_gate=gates[0], epoch=0)
    got = batches[0]
    assert set(got) == set(want)
    for k in want:
        if isinstance(want[k], list):
            assert got[k] == want[k], k
        else:
            assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k
    # big arrays are whole-batch buffers (native pool views), and live
    # independently of later batches
    assert got["point_clouds"].flags.c_contiguous
    snap = got["point_clouds"][0, :4, :4].copy()
    _ = list(BatchIterator(ds, 2, epoch=1, rng=np.random.default_rng(9)))
    assert np.array_equal(got["point_clouds"][0, :4, :4], snap)


def test_scanqa_dataset_direct_write():
    """ScanQADataset rides the same get_item(out=...) path."""
    from vlp3d.data.vqa_dataset import ScanQADataset
    from vlp3d.data.dataset import InMemorySceneSource
    from vlp3d.data.tokenizer import HashTokenizer

    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 4, (500, 3)).astype(np.float32)
    scenes = {"scene0000_00": {
        "point_cloud": pts,
        "instance_labels": np.zeros(500, np.int64),
        "semantic_labels": np.zeros(500, np.int64),
        "instance_bboxes": np.zeros((1, 8), np.float32),
    }}
    qa = [{"scene_id": "scene0000_00", "question": "what is red",
           "answers": ["chair"], "question_id": "q0"}]
    ds = ScanQADataset(
        qa, InMemorySceneSource(scenes), HashTokenizer(),
        num_points=256, lang_num_max=2,
    )
    batch = next(iter(BatchIterator(ds, 1, drop_last=False)))
    assert batch["point_clouds"].shape == (1, 256, 4)
    assert batch["answer_cats"].shape[0] == 1
    item = ds[0]  # full-dict path still works
    assert item["point_clouds"].shape == (256, 4)
