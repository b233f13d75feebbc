"""Voxelization + rotated IoU/NMS tests vs straightforward oracles."""

import numpy as np
import jax.numpy as jnp

from vlp3d.ops.voxelize import hard_voxelize, dynamic_voxelize
from vlp3d.ops.iou3d import (
    box_to_corners,
    boxes_iou_bev,
    nms_rotated,
)


def hard_voxelize_oracle(points, voxel_size, coors_range, max_points, max_voxels):
    """Direct transcription of voxelization_cpu.cpp:45-100."""
    vs = np.asarray(voxel_size)
    lo = np.asarray(coors_range[:3])
    hi = np.asarray(coors_range[3:])
    grid = np.round((hi - lo) / vs).astype(int)
    cell_to_voxel = {}
    voxels = np.zeros((max_voxels, max_points, points.shape[1]), np.float32)
    coors = np.full((max_voxels, 3), -1, int)
    num = np.zeros(max_voxels, int)
    voxel_num = 0
    for i, p in enumerate(points):
        c = np.floor((p[:3] - lo) / vs).astype(int)
        if (c < 0).any() or (c >= grid).any():
            continue
        key = tuple(c)
        if key not in cell_to_voxel:
            if voxel_num >= max_voxels:
                continue
            cell_to_voxel[key] = voxel_num
            coors[voxel_num] = c
            voxel_num += 1
        v = cell_to_voxel[key]
        if num[v] < max_points:
            voxels[v, num[v]] = p
            num[v] += 1
    return voxels, coors, num, voxel_num


class TestVoxelize:
    def test_matches_oracle(self, rng):
        pts = rng.uniform(-1, 3, (500, 4)).astype(np.float32)
        vs = [0.5, 0.5, 0.5]
        cr = [0, 0, 0, 2, 2, 2]
        out = hard_voxelize(jnp.asarray(pts), vs, cr, max_points=8,
                            max_voxels=32)
        vox_w, coors_w, num_w, vn_w = hard_voxelize_oracle(
            pts, vs, cr, 8, 32
        )
        assert int(out["voxel_num"]) == vn_w
        np.testing.assert_array_equal(np.asarray(out["coors"]), coors_w)
        np.testing.assert_array_equal(
            np.asarray(out["num_points_per_voxel"]), num_w
        )
        np.testing.assert_allclose(np.asarray(out["voxels"]), vox_w)

    def test_dynamic(self, rng):
        pts = rng.uniform(-1, 3, (100, 3)).astype(np.float32)
        coords, grid = dynamic_voxelize(jnp.asarray(pts), [0.5] * 3,
                                        [0, 0, 0, 2, 2, 2])
        inside = np.all((pts >= 0) & (pts < 2), axis=1)
        got_valid = np.asarray(coords[:, 0]) >= 0
        np.testing.assert_array_equal(got_valid, inside)


def rect_corners_np(box):
    return np.asarray(box_to_corners(jnp.asarray(box)))


def rotated_iou_oracle(a, b, n_samples=400):
    """Monte-carlo rotated IoU for verification."""
    rng = np.random.default_rng(0)
    ca, cb = rect_corners_np(a), rect_corners_np(b)
    lo = np.minimum(ca.min(0), cb.min(0)) - 0.1
    hi = np.maximum(ca.max(0), cb.max(0)) + 0.1
    pts = rng.uniform(lo, hi, (n_samples * 100, 2))

    def inside(c, p):
        res = np.ones(len(p), bool)
        for k in range(4):
            d = c[(k + 1) % 4] - c[k]
            s = d[0] * (p[:, 1] - c[k][1]) - d[1] * (p[:, 0] - c[k][0])
            res &= s >= -1e-9
        return res

    in_a = inside(ca, pts)
    in_b = inside(cb, pts)
    inter = (in_a & in_b).mean()
    union = (in_a | in_b).mean()
    return inter / union if union > 0 else 0.0


class TestRotatedIoU:
    def test_identical(self):
        box = jnp.array([[0.0, 0.0, 2.0, 1.0, 0.7]])
        iou = np.asarray(boxes_iou_bev(box, box))[0, 0]
        assert abs(iou - 1.0) < 1e-5

    def test_disjoint(self):
        a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.3]])
        b = jnp.array([[5.0, 5.0, 6.0, 6.0, 1.0]])
        assert float(boxes_iou_bev(a, b)[0, 0]) == 0.0

    def test_monte_carlo(self, rng):
        for _ in range(5):
            a = np.array([0, 0, 2, 1.5, rng.uniform(0, np.pi)])
            b = np.array(
                [rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5), 1.8, 1.2,
                 rng.uniform(0, np.pi)]
            )
            got = float(boxes_iou_bev(jnp.asarray(a[None]),
                                      jnp.asarray(b[None]))[0, 0])
            want = rotated_iou_oracle(a, b)
            assert abs(got - want) < 0.02, (got, want)

    def test_nms(self):
        boxes = jnp.array(
            [
                [0, 0, 2, 2, 0.0],
                [0.1, 0.1, 2.1, 2.1, 0.0],  # heavy overlap with 0
                [5, 5, 7, 7, 0.5],
            ]
        )
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = np.asarray(nms_rotated(boxes, scores, 0.5))
        np.testing.assert_array_equal(keep, [True, False, True])
