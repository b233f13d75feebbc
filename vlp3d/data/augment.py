"""Host-side scene augmentations (numpy, seeded rng).

Ports of `utils/utils_fn.py:28-142` and
`data/scannet/model_util_scannet.py:48-80`, preserving the reference's rng
draw ORDER so fixed seeds reproduce the same augmentation streams:
flip (two p=0.3 draws) -> rotate (x/y/z each U(-5deg, +5deg)) ->
scale (exp(U(-0.1, 0.1)) diagonal) -> translate (U{-0.5..0.5 step .001}).
"""

from __future__ import annotations

import numpy as np


def rotx(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def rotate_aligned_boxes_along_axis(input_boxes, rot_mat, axis):
    """Axis-aligned box re-fit after rotation
    (model_util_scannet.py:48-80, including its corner-projection quirks)."""
    centers, lengths = input_boxes[:, 0:3], input_boxes[:, 3:6]
    new_centers = np.dot(centers, np.transpose(rot_mat))

    if axis == "x":
        d1, d2 = lengths[:, 1] / 2.0, lengths[:, 2] / 2.0
    elif axis == "y":
        d1, d2 = lengths[:, 0] / 2.0, lengths[:, 2] / 2.0
    else:
        d1, d2 = lengths[:, 0] / 2.0, lengths[:, 1] / 2.0

    new_1 = np.zeros((d1.shape[0], 4))
    new_2 = np.zeros((d1.shape[0], 4))
    for i, crnr in enumerate([(-1, -1), (1, -1), (1, 1), (-1, 1)]):
        crnrs = np.zeros((d1.shape[0], 3))
        crnrs[:, 0] = crnr[0] * d1
        crnrs[:, 1] = crnr[1] * d2
        crnrs = np.dot(crnrs, np.transpose(rot_mat))
        new_1[:, i] = crnrs[:, 0]
        new_2[:, i] = crnrs[:, 1]
    new_d1 = 2.0 * np.max(new_1, 1)
    new_d2 = 2.0 * np.max(new_2, 1)

    if axis == "x":
        new_lengths = np.stack((lengths[:, 0], new_d1, new_d2), axis=1)
    elif axis == "y":
        new_lengths = np.stack((new_d1, lengths[:, 1], new_d2), axis=1)
    else:
        new_lengths = np.stack((new_d1, new_d2, lengths[:, 2]), axis=1)
    return np.concatenate([new_centers, new_lengths], axis=1)


def flip_augment(point_cloud, target_bboxes, rng):
    """YZ / XZ plane flips, each with p = 0.3 (utils_fn.py:28-40)."""
    if rng.random() > 0.7:
        point_cloud[:, 0] = -point_cloud[:, 0]
        target_bboxes[:, 0] = -target_bboxes[:, 0]
    if rng.random() > 0.7:
        point_cloud[:, 1] = -point_cloud[:, 1]
        target_bboxes[:, 1] = -target_bboxes[:, 1]
    return point_cloud, target_bboxes


def rotate_augment(point_cloud, target_bboxes, rng):
    """±5° rotations about x, y, z (utils_fn.py:81-106): boxes re-fit per
    axis, points rotated by rotx^T @ roty^T @ rotz^T."""
    ax = (rng.random() * np.pi / 18) - np.pi / 36
    mx = rotx(ax)
    target_bboxes = rotate_aligned_boxes_along_axis(target_bboxes, mx, "x")
    ay = (rng.random() * np.pi / 18) - np.pi / 36
    my = roty(ay)
    target_bboxes = rotate_aligned_boxes_along_axis(target_bboxes, my, "y")
    az = (rng.random() * np.pi / 18) - np.pi / 36
    mz = rotz(az)
    target_bboxes = rotate_aligned_boxes_along_axis(target_bboxes, mz, "z")

    rot = np.dot(np.transpose(mx), np.transpose(my))
    rot = np.dot(rot, np.transpose(mz))
    point_cloud[:, 0:3] = np.dot(point_cloud[:, 0:3], rot)
    return point_cloud, target_bboxes


def translate(point_set, bbox, rng):
    grid = np.arange(-0.5, 0.501, 0.001)
    factor = [rng.choice(grid, size=1)[0] for _ in range(3)]
    point_set[:, :3] += factor
    bbox[:, :3] += factor
    return point_set, bbox


def scale_augment(point_cloud, target_bboxes, use_height, rng):
    """exp(U(-0.1, 0.1)) per-axis scale + translate (utils_fn.py:110-128).
    The reference draws a full (3,3) uniform then keeps the diagonal."""
    scale = rng.uniform(-0.1, 0.1, (3, 3))
    scale = np.exp(scale) * np.eye(3)
    point_cloud[:, 0:3] = np.dot(point_cloud[:, 0:3], scale)
    if use_height:
        point_cloud[:, 3] = point_cloud[:, 3] * float(scale[2, 2])
    target_bboxes[:, 0:3] = np.dot(target_bboxes[:, 0:3], scale)
    target_bboxes[:, 3:6] = np.dot(target_bboxes[:, 3:6], scale)
    return translate(point_cloud, target_bboxes, rng)


def augment_scene(point_cloud, target_bboxes, use_height, rng):
    """Full train-time augmentation chain (dataset.py:653-661)."""
    point_cloud, target_bboxes = flip_augment(point_cloud, target_bboxes, rng)
    point_cloud, target_bboxes = rotate_augment(
        point_cloud, target_bboxes, rng
    )
    return scale_augment(point_cloud, target_bboxes, use_height, rng)
