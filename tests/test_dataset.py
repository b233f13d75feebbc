"""Dataset contract tests on in-memory synthetic scenes."""

import numpy as np

from vlp3d.data.dataset import (
    BatchIterator,
    InMemorySceneSource,
    MAX_NUM_OBJ,
    ScanReferJointDataset,
    collate,
)
from vlp3d.data.tokenizer import HashTokenizer


def make_scene(rng, n_points=2000, n_obj=4):
    bboxes = np.zeros((n_obj, 8), np.float32)
    pts = rng.uniform(0, 5, (n_points, 3)).astype(np.float32)
    instance = np.zeros(n_points, np.int64)
    semantic = np.zeros(n_points, np.int64)
    per = n_points // (2 * n_obj)
    for i in range(n_obj):
        c = rng.uniform(1, 4, 3)
        s = rng.uniform(0.5, 1.0, 3)
        sl = slice(i * per, (i + 1) * per)
        pts[sl] = c + (rng.uniform(-0.5, 0.5, (per, 3)) * s)
        instance[sl] = i + 1
        semantic[sl] = 5  # nyu40 id in detection set
        bboxes[i, 0:3] = c
        bboxes[i, 3:6] = s
        bboxes[i, 6] = 5  # nyu40 sem id
        bboxes[i, 7] = i + 10  # object id
    # reference layout: [...,-2] is sem id, [...,-1] is object id
    return {
        "point_cloud": pts,
        "instance_labels": instance,
        "semantic_labels": semantic,
        "instance_bboxes": bboxes,
    }


def make_annotations(scene_ids, n_per_scene=5):
    anns = []
    for sid in scene_ids:
        for a in range(n_per_scene):
            anns.append(
                {
                    "scene_id": sid,
                    "object_id": str(10 + (a % 3)),
                    "object_name": "chair",
                    "ann_id": str(a),
                    "token": ["the", "red", "chair", "near", "the", "door"],
                }
            )
    return anns


def build_dataset(**kw):
    rng = np.random.default_rng(0)
    scenes = {f"scene{i:04d}_00": make_scene(rng) for i in range(2)}
    anns = make_annotations(sorted(scenes))
    return ScanReferJointDataset(
        anns,
        InMemorySceneSource(scenes),
        HashTokenizer(),
        num_points=512,
        lang_num_max=4,
        bert_max_len=16,
        **kw,
    )


def test_chunking():
    ds = build_dataset()
    # 5 anns/scene, cap 4 -> chunks of 4+1 per scene = 4 chunks total
    assert len(ds) == 4
    sizes = sorted(len(c) for c in ds.chunks)
    assert sizes == [1, 1, 4, 4]
    ds.shuffle_data()
    assert len(ds) == 4


def test_item_contract():
    ds = build_dataset()
    item = ds[0]
    assert item["point_clouds"].shape == (512, 4)  # xyz + height
    assert item["vote_label"].shape == (512, 9)
    assert item["center_label"].shape == (MAX_NUM_OBJ, 3)
    assert item["ref_center_label_list"].shape == (4, 3)
    assert item["input_ids"].shape == (4, 16)
    assert item["input_ids"][0, 0] == 101  # CLS
    assert item["vote_label_mask"].sum() > 0
    # votes point from object points to box centers
    m = item["vote_label_mask"].astype(bool)
    voted = item["point_clouds"][m, :3] + item["vote_label"][m, :3]
    spread = voted.std(axis=0).max()
    assert spread < 2.0  # votes collapse toward a few centers

    # ref labels: each sentence's ref one-hot matches a GT box
    assert (item["ref_box_label_list"].sum(-1) <= 1).all()
    j = int(np.argmax(item["ref_box_label_list"].sum(-1)))
    i = int(np.argmax(item["ref_box_label_list"][j]))
    np.testing.assert_allclose(
        item["ref_center_label_list"][j], item["center_label"][i]
    )


def test_augmented_item_finite():
    ds = build_dataset(augment=True, lang_num_aug=1)
    item = ds[0]
    assert np.isfinite(item["point_clouds"]).all()
    assert item["input_ids"].shape == (4, 16)


def test_collate_and_iterator():
    ds = build_dataset()
    batch = collate([ds[0], ds[1]], random_gate=0.3, epoch=2)
    assert batch["point_clouds"].shape == (2, 512, 4)
    assert batch["epoch"] == 2
    assert abs(float(batch["random"]) - 0.3) < 1e-6

    it = BatchIterator(ds, batch_size=2, epoch=0)
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["input_ids"].shape == (2, 4, 16)


def test_multiworker_iterator_identical_stream():
    """num_workers must not change the batch stream (order, contents, or
    random gates)."""
    ds = build_dataset()
    ref = list(
        BatchIterator(
            ds, batch_size=1, epoch=1, rng=np.random.default_rng(5)
        )
    )
    for w in (2, 3):
        got = list(
            BatchIterator(
                ds, batch_size=1, epoch=1, num_workers=w,
                rng=np.random.default_rng(5),
            )
        )
        assert len(got) == len(ref)
        for a, b in zip(ref, got):
            assert a.keys() == b.keys()
            assert float(a["random"]) == float(b["random"])
            for k in a:
                if isinstance(a[k], np.ndarray):
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_item_slice_matches_global_rows():
    """Multi-host local loading (BatchIterator item_slice): a process
    that builds only rows [s, s+k) of each batch must produce arrays
    bit-identical to slicing the globally-built batch — with train-time
    augmentation ON, since per-item randomness being counter-based is
    exactly what makes this safe (the Solver multi-host train feed)."""
    ds = build_dataset(augment=True)
    full = list(
        BatchIterator(
            ds, batch_size=4, epoch=1, rng=np.random.default_rng(7)
        )
    )
    for (s, k) in ((0, 2), (2, 2), (1, 1)):
        local = list(
            BatchIterator(
                ds, batch_size=4, epoch=1,
                rng=np.random.default_rng(7), item_slice=(s, k),
            )
        )
        assert len(local) == len(full)
        for a, b in zip(full, local):
            assert float(a["random"]) == float(b["random"])
            for key in a:
                if not isinstance(a[key], np.ndarray):
                    continue
                if a[key].ndim >= 1 and a[key].shape[0] == 4:
                    np.testing.assert_array_equal(
                        a[key][s:s + k], b[key], err_msg=key
                    )
                else:  # shared scalars (epoch/istrain/random)
                    np.testing.assert_array_equal(a[key], b[key])


def test_item_slice_validation():
    import pytest

    ds = build_dataset()
    with pytest.raises(ValueError):
        BatchIterator(ds, batch_size=4, item_slice=(3, 2))
    with pytest.raises(ValueError):
        BatchIterator(ds, batch_size=4, item_slice=(-1, 1))
    with pytest.raises(ValueError):
        # a partial tail batch could leave the slice empty
        BatchIterator(ds, batch_size=4, drop_last=False, item_slice=(0, 2))


def test_multiworker_iterator_raises_worker_error():
    """A worker-thread exception must surface in the consumer, not hang
    the iterator (the pre-round-2d per-worker-queue design could hang)."""
    ds = build_dataset()

    class Boom(RuntimeError):
        pass

    class FailingDataset:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            if i == 2:
                raise Boom("item 2")
            return ds[i]

    import pytest

    it = BatchIterator(
        FailingDataset(), batch_size=1, epoch=0, num_workers=3,
        rng=np.random.default_rng(0),
    )
    with pytest.raises(Boom):
        list(it)


def test_scene_object_rotation_fields():
    """Scan2CAD orientation fields appear when object_rotations is given
    (dataset.py:797-809); absent otherwise."""
    ds = build_dataset()
    assert "scene_object_rotations" not in ds[0]
    assert "scene_object_ids" in ds[0]

    # map the first scene's first GT object to a 90-deg rotation
    item = ds[0]
    first_obj = int(item["scene_object_ids"][0])
    scene_id = ds.chunks[0][0]["scene_id"]
    rot = [[0, -1, 0], [1, 0, 0], [0, 0, 1]]
    ds2 = build_dataset(
        object_rotations={scene_id: {str(first_obj): rot}}
    )
    # find the chunk for that scene
    idx = next(
        i for i, c in enumerate(ds2.chunks) if c[0]["scene_id"] == scene_id
    )
    item2 = ds2[idx]
    assert item2["scene_object_rotations"].shape == (
        item2["scene_object_ids"].shape[0], 3, 3
    )
    assert item2["scene_object_rotation_masks"][0] == 1
    np.testing.assert_allclose(
        item2["scene_object_rotations"][0], np.asarray(rot, np.float32)
    )
    assert item2["scene_object_rotation_masks"][1:].sum() == 0
