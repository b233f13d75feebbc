"""Validation against the REAL ScanNet meta assets bundled with the
reference checkout (data files, not code): scannetv2-labels.combined.tsv,
scannet_reference_means.npz, and the v2 split lists.

These are the exact files a real training run consumes via --labels_tsv /
--mean_size_npz (reference: lib/joint/dataset.py:59-77 builds raw2label
from the tsv; data/scannet/model_util_scannet.py loads the means npz).
Synthetic fixtures can't catch column-index or taxonomy drift; this test
pins the loaders to the real files whenever a reference checkout is
present (env VLP3D_SCANNET_META overrides the location).
"""

import os

import numpy as np
import pytest

from vlp3d.config import DatasetConfig
from vlp3d.data.dataset import (
    NYU40_IDS,
    SCANNET_TYPE2CLASS,
    build_nyu40id2class,
    load_raw2label,
    unique_multiple_lookup,
)

META = os.environ.get(
    "VLP3D_SCANNET_META", "/root/reference/data/scannet/meta_data"
)
TSV = os.path.join(META, "scannetv2-labels.combined.tsv")
MEANS = os.path.join(META, "scannet_reference_means.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(TSV), reason="no real ScanNet meta assets"
)

# nyu40 id -> 18-class id for the 17 named detection categories
# (VoteNet taxonomy; model_util_scannet.py nyu40ids order)
KNOWN_NYU40 = {
    3: 0,   # cabinet
    4: 1,   # bed
    5: 2,   # chair
    6: 3,   # sofa
    7: 4,   # table
    8: 5,   # door
    9: 6,   # window
    10: 7,  # bookshelf
    11: 8,  # picture
    12: 9,  # counter
    14: 10,  # desk
    16: 11,  # curtain
    24: 12,  # refrigerator
    28: 13,  # shower curtain
    33: 14,  # toilet
    34: 15,  # sink
    36: 16,  # bathtub
}


def test_raw2label_real_tsv():
    raw2label = load_raw2label(TSV)
    # ~600 raw categories in the v2 tsv
    assert len(raw2label) > 500
    assert raw2label["chair"] == SCANNET_TYPE2CLASS["chair"] == 2
    assert raw2label["table"] == 4
    assert raw2label["door"] == 5
    assert raw2label["toilet"] == 14
    # raw names whose nyu40class is outside the 17 named categories
    # collapse to "others" (reference dataset.py:72-75)
    assert raw2label["wall"] == SCANNET_TYPE2CLASS["others"] == 17
    assert raw2label["floor"] == 17
    # multi-word raw category present verbatim
    assert raw2label["shower curtain"] == 13
    # every value is a valid 18-class id
    assert set(raw2label.values()) <= set(range(18))


def test_nyu40id2class_real_tsv():
    out = build_nyu40id2class(TSV)
    for nyu40_id, cls in KNOWN_NYU40.items():
        assert out[nyu40_id] == cls, (nyu40_id, out[nyu40_id], cls)
    # only detection-relevant nyu40 ids (plus the 0 sentinel) are keyed
    assert set(out) <= set(NYU40_IDS) | {0}
    # the "otherfurniture"-style ids inside NYU40_IDS map to others
    others = [k for k, v in out.items() if v == 17 and k != 0]
    assert others, "expected some NYU40 detection ids mapping to others"


def test_reference_means_npz():
    cfg = DatasetConfig(mean_size_path=MEANS)
    arr = cfg.mean_size_arr()
    assert arr.shape == (18, 3) and arr.dtype == np.float32
    assert np.isfinite(arr).all() and (arr > 0).all()
    raw = np.load(MEANS)["arr_0"]
    assert np.allclose(arr, raw.astype(np.float32))
    # chair (class 2) is decimeter-scale, bed (class 1) is meter-scale
    assert arr[2].max() < 1.5 and arr[1].max() > 1.5


def test_split_lists():
    train = open(os.path.join(META, "scannetv2_train.txt")).read().split()
    val = open(os.path.join(META, "scannetv2_val.txt")).read().split()
    test = open(os.path.join(META, "scannetv2_test.txt")).read().split()
    # the published ScanNet v2 split sizes
    assert len(train) == 1201 and len(val) == 312 and len(test) == 100
    assert all(s.startswith("scene") for s in train + val + test)
    assert not (set(train) & set(val))


def test_unique_multiple_with_real_taxonomy():
    """unique/multiple assignment driven by the REAL raw2label: two
    chairs in one scene are 'multiple', a single table is 'unique'
    (reference dataset.py:79-134 semantics)."""
    raw2label = load_raw2label(TSV)
    scanrefer = [
        {"scene_id": "s1", "object_id": "0", "ann_id": "0",
         "object_name": "chair"},
        {"scene_id": "s1", "object_id": "1", "ann_id": "0",
         "object_name": "chair"},
        {"scene_id": "s1", "object_id": "2", "ann_id": "0",
         "object_name": "table"},
    ]
    lookup = unique_multiple_lookup(scanrefer, raw2label)
    # ann keys are ints (normalized to match get_item's int ann_id_list
    # reads; see tests/test_refparity_dataset.py)
    assert lookup["s1"]["0"][0] == 1  # chair: multiple
    assert lookup["s1"]["1"][0] == 1
    assert lookup["s1"]["2"][0] == 0  # table: unique
