"""DIRECT offline-export parity: the reference's
data/scannet/batch_load_scannet_data.export_one_scan (which wraps
load_scannet_data.export + scannet_utils mesh/normal readers) run as the
oracle on a synthetic scan written in ScanNet's on-disk layout
(_vh_clean_2.ply binary mesh + aggregation/segs jsons + axis-align meta)
vs vlp3d/data/scannet.export_one_scan.

Pins the full export surface: PLY vertex parsing, FACE-accumulated
vertex normals (incl. the buffered fancy-indexing quirk where duplicate
corner indices keep only the last face's contribution), axis alignment,
seg/aggregation label assignment, instance boxes from UNALIGNED vs
aligned vertices, the OBJ_CLASS_IDS box filter, and the 50k subsample
(shared np.random seed: the reference draws global np.random.choice,
batch_load_scannet_data.py:52).
"""

import json
import os
import struct
import sys

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.data import scannet as ours

TSV = "/root/reference/data/scannet/meta_data/scannetv2-labels.combined.tsv"
SCAN = "scene0777_00"


def write_binary_ply_mesh(path, verts, faces):
    """ScanNet layout: x y z red green blue alpha + list-typed faces."""
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "property uchar alpha\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        for v in verts:
            f.write(struct.pack(
                "<fffBBBB", *v[:3], *[int(c) for c in v[3:6]], 255
            ))
        for face in faces:
            f.write(struct.pack("<Biii", 3, *[int(i) for i in face]))


def make_scan(root, rng, n=1200, with_meta=True):
    """A scan directory in ScanNet layout: 3 labelled objects ('chair',
    'table', 'wall' — wall's nyu id 1 is outside OBJ_CLASS_IDS so its box
    must be filtered), shared + duplicate face corners (exercising the
    normal-accumulation quirk), segments split across objects."""
    scandir = os.path.join(root, SCAN)
    os.makedirs(scandir)
    base = os.path.join(scandir, SCAN)

    verts = np.zeros((n, 6), np.float32)
    verts[:, :3] = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    verts[:, 3:6] = rng.integers(0, 256, (n, 3))
    seg_ids = rng.integers(0, 30, n)

    # faces over random triples (duplicates included on purpose)
    faces = rng.integers(0, n, (3 * n, 3)).astype(np.int64)
    faces[10] = faces[11]  # identical triangles -> duplicate corners
    faces = faces[faces[:, 0] != faces[:, 1]]

    write_binary_ply_mesh(base + "_vh_clean_2.ply", verts, faces)
    with open(base + "_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_ids.tolist()}, f)
    groups = [
        {"objectId": 0, "label": "chair", "segments": [0, 1, 2, 3]},
        {"objectId": 1, "label": "table", "segments": [4, 5, 6]},
        {"objectId": 2, "label": "wall", "segments": [7, 8]},
    ]
    with open(base + ".aggregation.json", "w") as f:
        json.dump({"segGroups": groups}, f)
    lines = ["sceneType = Apartment"]
    if with_meta:
        # a rotation+translation, f32-representable entries
        m = np.eye(4)
        th = 0.3
        m[0, 0] = m[1, 1] = np.float32(np.cos(th))
        m[0, 1] = np.float32(-np.sin(th))
        m[1, 0] = np.float32(np.sin(th))
        m[0, 3], m[1, 3], m[2, 3] = 0.25, -0.5, 0.125
        lines.append(
            "axisAlignment = " + " ".join(repr(float(x)) for x in m.ravel())
        )
    with open(base + ".txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return scandir


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def ref_export(torch):
    """Import the reference exporter; its module body eagerly reads
    meta_data/scannetv2.txt relative to CWD, satisfied by chdir into the
    checkout's data/scannet (where the real meta assets live)."""
    refdir = "/root/reference/data/scannet"
    cwd = os.getcwd()
    os.chdir(refdir)
    if refdir not in sys.path:
        sys.path.insert(0, refdir)
    try:
        import batch_load_scannet_data as ref_mod
    finally:
        os.chdir(cwd)
    return ref_mod


@pytest.mark.parametrize("with_meta", [True, False],
                         ids=["aligned", "no-axis-align"])
def test_export_one_scan_parity(torch, ref_export, tmp_path, with_meta):
    scans = tmp_path / f"scans_{with_meta}"
    scans.mkdir()
    make_scan(str(scans), np.random.default_rng(5), with_meta=with_meta)

    ref_out = tmp_path / f"ref_{with_meta}"
    our_out = tmp_path / f"ours_{with_meta}"
    ref_out.mkdir()
    our_out.mkdir()

    ref_export.SCANNET_DIR = str(scans)
    ref_export.LABEL_MAP_FILE = TSV
    # tiny cap so the subsample path actually runs
    ref_export.MAX_NUM_POINT = 1000
    np.random.seed(123)
    ref_export.export_one_scan(SCAN, str(ref_out / SCAN))

    label_map = ours.read_label_map(TSV)
    old_cap = ours.MAX_NUM_POINT
    ours.MAX_NUM_POINT = 1000
    try:
        np.random.seed(123)
        ours.export_one_scan(
            str(scans), SCAN, label_map, str(our_out / SCAN),
            rng=np.random,  # share the oracle's global stream
        )
    finally:
        ours.MAX_NUM_POINT = old_cap

    for suffix, atol in [
        ("_vert", 2e-7),          # normals: f32 store of f64 math
        ("_aligned_vert", 2e-6),  # + axis-align matmul order
        ("_sem_label", 0),
        ("_ins_label", 0),
        ("_bbox", 2e-6),
        ("_aligned_bbox", 2e-6),
    ]:
        r = np.load(str(ref_out / SCAN) + suffix + ".npy")
        o = np.load(str(our_out / SCAN) + suffix + ".npy")
        assert r.shape == o.shape, f"{suffix}: {r.shape} vs {o.shape}"
        np.testing.assert_allclose(
            o.astype(np.float64), r.astype(np.float64),
            rtol=0, atol=atol, err_msg=suffix,
        )
    # the scan must be big enough that subsampling actually happened
    assert np.load(str(ref_out / SCAN) + "_vert.npy").shape == (1000, 9)


def test_build_preprocess_uses_stored_normals(tmp_path):
    """use_normal consumes the exporter's face normals (cols 6:9), not
    the kNN estimate (scripts/preprocess/point_cloud.py:41-43)."""
    rng = np.random.default_rng(0)
    vert = rng.normal(size=(50, 9)).astype(np.float32)
    np.save(tmp_path / "sceneX_aligned_vert.npy", vert)
    out = ours.build_preprocess(
        str(tmp_path), "sceneX", "train", use_normal=True
    )
    np.testing.assert_array_equal(out[:, 3:6], vert[:, 6:9])


def test_build_preprocess_fuse_order_multiview(tmp_path):
    """Fused channel order is [xyz, normal, multiview] — the reference
    concatenates normals BEFORE multiview
    (scripts/preprocess/point_cloud.py:41-47), which is what makes the
    relation module's hard-coded slice point_clouds[..., 6:6+128]
    (relation_module.py:101) pick up the multiview block under the
    canonical --use_normal --use_multiview flags."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(1)
    vert = rng.normal(size=(40, 9)).astype(np.float32)
    np.save(tmp_path / "sceneY_aligned_vert.npy", vert)
    mv = rng.normal(size=(40, 128)).astype(np.float32)
    mv_path = str(tmp_path / "mv.hdf5")
    with h5py.File(mv_path, "w") as f:
        f.create_dataset("sceneY", data=mv)
    out = ours.build_preprocess(
        str(tmp_path), "sceneY", "train",
        use_normal=True, multiview_path=mv_path,
    )
    assert out.shape == (40, 3 + 3 + 128)
    np.testing.assert_array_equal(out[:, 3:6], vert[:, 6:9])
    np.testing.assert_allclose(out[:, 6:6 + 128], mv, rtol=1e-6)
