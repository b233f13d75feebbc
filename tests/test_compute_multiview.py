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
