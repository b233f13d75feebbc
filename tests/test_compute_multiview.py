"""compute_multiview CLI: frames -> ENet -> projection -> hdf5."""

import numpy as np
import pytest


def test_compute_multiview_end_to_end(tmp_path):
    h5py = pytest.importorskip("h5py")

    from vlp3d.cli.compute_multiview import main

    scene = "scene0000_00"
    fdir = tmp_path / "frames" / scene
    for sub in ("color", "depth", "pose"):
        (fdir / sub).mkdir(parents=True)

    rng = np.random.default_rng(0)
    H = W = 64  # feature map 8x8 after ENet's /8
    # camera at origin looking +z; all depth 2.0
    np.save(fdir / "color" / "000.npy",
            rng.random((H, W, 3)).astype(np.float32))
    np.save(fdir / "depth" / "000.npy", np.full((H, W), 2.0, np.float32))
    np.savetxt(fdir / "pose" / "000.txt", np.eye(4))

    # points on the z=2 plane inside the frustum (fx=8 at feature res 8x8
    # from fx=64 at 64x64; cx=4 -> x in (-1, 1) projects inside)
    sdata = tmp_path / "scannet"
    sdata.mkdir()
    pts_in = np.stack(
        [np.linspace(-0.8, 0.8, 50), np.linspace(-0.8, 0.8, 50),
         np.full(50, 2.0)], axis=1
    )
    pts_out = np.stack(
        [np.full(10, 50.0), np.zeros(10), np.full(10, 2.0)], axis=1
    )  # far outside the frustum
    verts = np.concatenate(
        [np.concatenate([pts_in, pts_out]), np.zeros((60, 3))], axis=1
    )
    np.save(sdata / f"{scene}_aligned_vert.npy", verts.astype(np.float32))

    out = str(tmp_path / "enet_feats_maxpool.hdf5")
    main([
        "--frames_dir", str(tmp_path / "frames"),
        "--scannet_data", str(sdata),
        "--out", out,
        "--fx", "64", "--fy", "64", "--cx", "32", "--cy", "32",
    ])

    with h5py.File(out) as f:
        feats = np.asarray(f[scene])
    assert feats.shape == (60, 128)
    # in-frustum points received features; out-of-frustum got zeros
    assert np.abs(feats[:50]).sum() > 0
    np.testing.assert_array_equal(feats[50:], 0.0)


def test_project_multiview_labels(tmp_path):
    """--labels mode: per-point majority vote over frame label maps
    (project_multiview_labels.py)."""
    from vlp3d.cli.compute_multiview import main

    scene = "scene0000_00"
    fdir = tmp_path / "frames" / scene
    for sub in ("label", "depth", "pose"):
        (fdir / sub).mkdir(parents=True)

    H = W = 16
    # frame 0: left half label 5, right half label 7; frame 1: all label 7
    lab0 = np.zeros((H, W), np.int64)
    lab0[:, : W // 2] = 5
    lab0[:, W // 2:] = 7
    lab1 = np.full((H, W), 7, np.int64)
    for i, lab in enumerate((lab0, lab1)):
        np.save(fdir / "label" / f"{i:03d}.npy", lab)
        np.save(fdir / "depth" / f"{i:03d}.npy",
                np.full((H, W), 2.0, np.float32))
        np.savetxt(fdir / "pose" / f"{i:03d}.txt", np.eye(4))

    sdata = tmp_path / "scannet"
    sdata.mkdir()
    # one point projecting to the left half (x<0), one to the right
    # (x>0), one far outside the frustum
    pts = np.array(
        [[-0.5, 0.0, 2.0], [0.5, 0.0, 2.0], [50.0, 0.0, 2.0]]
    )
    verts = np.concatenate([pts, np.zeros((3, 3))], axis=1)
    np.save(sdata / f"{scene}_aligned_vert.npy", verts.astype(np.float32))

    out = str(tmp_path / "out" / "labels.hdf5")
    main([
        "--frames_dir", str(tmp_path / "frames"),
        "--scannet_data", str(sdata),
        "--out", out,
        "--labels",
        "--fx", "16", "--fy", "16", "--cx", "8", "--cy", "8",
    ])
    labels = np.load(tmp_path / "out" / f"{scene}_multiview_labels.npy")
    # left point: one vote for 5, one for 7 -> argmax picks 5 (lower id);
    # right point: two votes for 7; unseen point stays 0
    assert labels.tolist() == [5, 7, 0]
    assert (tmp_path / "out" / f"{scene}_multiview_labels.ply").exists()
