"""Offline ScanNet export on a synthetic scan (PLY + segs/agg jsons)."""

import json
import os
import struct

import numpy as np

from vlp3d.data.scannet import (
    build_preprocess,
    export_one_scan,
    read_mesh_vertices_rgb,
    read_label_map,
)


def write_binary_ply(path, verts):
    n = len(verts)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        for v in verts:
            f.write(struct.pack("<fffBBB", *v[:3], *[int(c) for c in v[3:6]]))


def make_scan(tmp_path, scan="scene0001_00"):
    d = tmp_path / scan
    d.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 300
    verts = np.zeros((n, 6))
    verts[:, :3] = rng.uniform(0, 4, (n, 3))
    verts[:, 3:] = rng.integers(0, 255, (n, 3))
    # two objects: points 0-99 (chair), 100-199 (table); rest background
    verts[:100, :3] = rng.uniform(0, 1, (100, 3)) + [1, 1, 0]
    verts[100:200, :3] = rng.uniform(0, 1, (100, 3)) + [3, 3, 0]
    write_binary_ply(str(d / f"{scan}_vh_clean_2.ply"), verts)

    segs = {"segIndices": [0] * 100 + [1] * 100 + [2] * 100}
    (d / f"{scan}_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps(segs)
    )
    agg = {
        "segGroups": [
            {"objectId": 0, "label": "chair", "segments": [0]},
            {"objectId": 1, "label": "table", "segments": [1]},
        ]
    }
    (d / f"{scan}.aggregation.json").write_text(json.dumps(agg))
    mat = np.eye(4)
    mat[0, 3] = 1.0  # translation in the axis-align matrix
    (d / f"{scan}.txt").write_text(
        "axisAlignment = " + " ".join(str(x) for x in mat.reshape(-1)) + "\n"
    )
    return verts


def test_export_and_preprocess(tmp_path):
    scan = "scene0001_00"
    verts = make_scan(tmp_path, scan)
    label_map = {"chair": 5, "table": 7}

    out = tmp_path / "out"
    out.mkdir()
    export_one_scan(str(tmp_path), scan, label_map, str(out / scan))

    mesh = np.load(out / f"{scan}_vert.npy")
    aligned = np.load(out / f"{scan}_aligned_vert.npy")
    sem = np.load(out / f"{scan}_sem_label.npy")
    ins = np.load(out / f"{scan}_ins_label.npy")
    bboxes = np.load(out / f"{scan}_aligned_bbox.npy")

    # 9 cols: xyz + rgb + face normals (zeros here: the fixture PLY has
    # no face element)
    assert mesh.shape == (300, 9)
    np.testing.assert_array_equal(mesh[:, 6:9], 0.0)
    np.testing.assert_allclose(aligned[:, 0], mesh[:, 0] + 1.0, atol=1e-5)
    assert (sem[:100] == 5).all() and (sem[100:200] == 7).all()
    assert (ins[:100] == 1).all() and (ins[200:] == 0).all()
    assert bboxes.shape == (2, 8)
    assert bboxes[0, 6] == 5 and bboxes[0, 7] == 0  # nyu40 id + object id
    # box encloses the object's aligned points
    pts = aligned[:100, :3]
    np.testing.assert_allclose(
        bboxes[0, :3], (pts.min(0) + pts.max(0)) / 2, atol=1e-4
    )

    pre = build_preprocess(str(out), scan, "train", use_normal=True)
    assert pre.shape == (300, 6)  # xyz + normals
    assert np.isfinite(pre).all()
    assert os.path.exists(out / f"{scan}_preprocess_train.npy")

    # multiview hdf5 source path (lib/vqa/dataset.py:967-990): per-point
    # 128-d ENet features appended to the point-cloud columns
    import h5py

    from vlp3d.data.dataset import DirectorySceneSource

    mv_path = str(tmp_path / "enet_feats_maxpool.hdf5")
    feats = np.arange(300 * 128, dtype=np.float32).reshape(300, 128)
    with h5py.File(mv_path, "w") as f:
        f.create_dataset(scan, data=feats)
    src = DirectorySceneSource(str(out), multiview_hdf5=mv_path)
    scene = src(scan, "train")
    assert scene["point_cloud"].shape == (300, 6 + 128)
    np.testing.assert_array_equal(scene["point_cloud"][:, 6:], feats)


def test_ply_reader_roundtrip(tmp_path):
    verts = make_scan(tmp_path, "scene0002_00")
    got = read_mesh_vertices_rgb(
        str(tmp_path / "scene0002_00" / "scene0002_00_vh_clean_2.ply")
    )
    np.testing.assert_allclose(got[:, :3], verts[:, :3], rtol=1e-6)
    np.testing.assert_array_equal(got[:, 3:], verts[:, 3:].astype(np.float32))


def test_label_map(tmp_path):
    tsv = tmp_path / "labels.tsv"
    tsv.write_text(
        "id\traw_category\tcategory\tcount\tnyu40id\teigen13id"
        "\tnyuClass\tnyu40class\n"
        "1\tchair\tchair\t100\t5\t4\tchair\tchair\n"
        "2\tcoffee table\ttable\t50\t7\t6\ttable\ttable\n"
    )
    m = read_label_map(str(tsv))
    assert m == {"chair": 5, "coffee table": 7}


class TestPreprocessLayoutCheck:
    """Stale-cache detection (ADVICE r2): old fuse order put normals
    LAST; same shape, silently misread — must raise at load."""

    def _mv(self, n, rng):
        return rng.normal(0, 2.0, (n, 128)).astype(np.float32)

    def _normals(self, n, rng):
        v = rng.normal(size=(n, 3)).astype(np.float32)
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    def test_current_order_passes(self, rng):
        from vlp3d.data.scannet import check_preprocess_layout

        n = 500
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        pc = np.concatenate([xyz, self._normals(n, rng), self._mv(n, rng)], 1)
        check_preprocess_layout(pc)  # no raise
        pc_color = np.concatenate(
            [xyz, rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
             self._normals(n, rng), self._mv(n, rng)], 1)
        check_preprocess_layout(pc_color)  # no raise

    def test_stale_order_raises(self, rng):
        import pytest as _pytest

        from vlp3d.data.scannet import check_preprocess_layout

        n = 500
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        stale = np.concatenate(
            [xyz, self._mv(n, rng), self._normals(n, rng)], 1)
        with _pytest.raises(ValueError, match="stale preprocess cache"):
            check_preprocess_layout(stale, "scene0000_00_preprocess_train.npy")

    def test_other_widths_ignored(self, rng):
        from vlp3d.data.scannet import check_preprocess_layout

        check_preprocess_layout(
            rng.normal(size=(100, 6)).astype(np.float32))  # ambiguous: skip

    def test_color_multiview_cache_with_dead_channels_accepted(self, rng):
        """[xyz, color, multiview] is also width 134; dead (all-zero)
        trailing ENet channels must not read as 'normals at the end'
        (code-review r3 finding)."""
        from vlp3d.data.scannet import MEAN_COLOR_RGB, check_preprocess_layout

        n = 500
        xyz = rng.normal(size=(n, 3)).astype(np.float32)
        color = ((rng.uniform(0, 255, (n, 3)) - MEAN_COLOR_RGB) / 256.0
                 ).astype(np.float32)
        mv = rng.normal(0, 2.0, (n, 128)).astype(np.float32)
        mv[:, -3:] = 0.0  # dead post-ReLU channels
        pc = np.concatenate([xyz, color, mv], 1)
        assert pc.shape[1] == 134
        check_preprocess_layout(pc)  # no raise
