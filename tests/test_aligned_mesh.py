"""Axis-aligned mesh export + scene vert dumps
(export_scannet_axis_aligned_mesh.py, data/scannet/visualize.py)."""

import struct

import numpy as np

from vlp3d.cli.export_aligned_mesh import dump_scene_verts, main
from vlp3d.data.scannet import read_mesh_vertices_rgb, read_ply_faces

VERTS = np.array(
    [
        [0.0, 0.0, 0.0, 255, 0, 0],
        [1.0, 0.0, 0.0, 0, 255, 0],
        [0.0, 1.0, 0.0, 0, 0, 255],
        [0.0, 0.0, 1.0, 10, 20, 30],
    ]
)
FACES = np.array([[0, 1, 2], [0, 2, 3]])


def _write_binary_mesh(path):
    with open(path, "wb") as f:
        f.write(
            b"ply\nformat binary_little_endian 1.0\n"
            b"element vertex 4\n"
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
            b"element face 2\n"
            b"property list uchar int vertex_indices\n"
            b"end_header\n"
        )
        for v in VERTS:
            f.write(struct.pack("<fffBBB", *v[:3], *(int(c) for c in v[3:])))
        for face in FACES:
            f.write(struct.pack("<Biii", 3, *face))


def test_mesh_export_applies_axis_alignment(tmp_path):
    scene = "scene0000_00"
    sdir = tmp_path / "scans" / scene
    sdir.mkdir(parents=True)
    _write_binary_mesh(sdir / f"{scene}_vh_clean_2.ply")
    # 90-degree rotation about z + translation
    mat = np.array(
        [[0, -1, 0, 1], [1, 0, 0, 2], [0, 0, 1, 3], [0, 0, 0, 1]],
        np.float64,
    )
    (sdir / f"{scene}.txt").write_text(
        "axisAlignment = " + " ".join(str(x) for x in mat.flatten()) + "\n"
    )

    out_dir = tmp_path / "aligned"
    main(["mesh", "--scans_dir", str(tmp_path / "scans"),
          "--out_dir", str(out_dir)])

    out_path = out_dir / f"{scene}.ply"
    got = read_mesh_vertices_rgb(str(out_path))
    hom = np.concatenate([VERTS[:, :3], np.ones((4, 1))], axis=1)
    expect = (hom @ mat.T)[:, :3]
    np.testing.assert_allclose(got[:, :3], expect, atol=1e-5)
    np.testing.assert_array_equal(got[:, 3:], VERTS[:, 3:])
    np.testing.assert_array_equal(read_ply_faces(str(out_path)), FACES)


def test_read_ply_faces_binary(tmp_path):
    path = tmp_path / "m.ply"
    _write_binary_mesh(path)
    np.testing.assert_array_equal(read_ply_faces(str(path)), FACES)


def test_dump_scene_verts(tmp_path):
    scene = "scene0001_00"
    np.save(tmp_path / f"{scene}_vert.npy", VERTS)
    np.save(tmp_path / f"{scene}_aligned_vert.npy", VERTS + 1)
    written = dump_scene_verts(str(tmp_path), scene)
    assert len(written) == 2
    lines = open(written[0]).read().strip().splitlines()
    assert len(lines) == 4 and lines[0].startswith("v 0.0 0.0 0.0 255")
