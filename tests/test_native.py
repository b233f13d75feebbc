"""Native C loader kernels vs numpy reference."""

import numpy as np
import pytest

from vlp3d import native
from vlp3d.data.dataset import NYU40_IDS


def numpy_votes(point_cloud, instance_labels, sem_ok):
    n = point_cloud.shape[0]
    votes = np.zeros((n, 3), np.float32)
    mask = np.zeros(n, np.float32)
    for i_instance in np.unique(instance_labels):
        ind = np.where(instance_labels == i_instance)[0]
        if sem_ok[ind[0]]:
            x = point_cloud[ind, :3]
            center = 0.5 * (x.min(0) + x.max(0))
            votes[ind, :] = center - x
            mask[ind] = 1.0
    return votes, mask


@pytest.mark.skipif(not native.native_available(), reason="no C compiler")
def test_compute_votes_parity(rng):
    n = 5000
    pc = rng.uniform(-3, 3, (n, 7)).astype(np.float32)
    inst = rng.integers(0, 12, n).astype(np.int64)
    sem = rng.integers(0, 41, n).astype(np.int64)
    sem_ok = np.isin(sem, list(NYU40_IDS))
    got_v, got_m = native.compute_votes(pc, inst, sem_ok)
    want_v, want_m = numpy_votes(pc, inst, sem_ok)
    np.testing.assert_array_equal(got_m, want_m)
    np.testing.assert_allclose(got_v, want_v, rtol=1e-6, atol=1e-6)


def test_native_builds():
    assert native.native_available(), "cc/gcc should exist in this image"


def _numpy_gather_augment(scene, choices, c_out, params, use_height, floor):
    """Oracle: plain gather, then the numpy augment chain + height —
    exactly what get_item's numpy path composes."""
    from vlp3d.data.augment import apply_augment_points

    c_raw = scene.shape[1]
    out = np.zeros((len(choices), c_out), np.float32)
    out[:, :c_raw] = scene[choices]
    h_pre = (out[:, 2] - np.float32(floor)) if use_height else None
    if params is not None:
        if use_height and c_raw == 3:
            out[:, 3] = h_pre
        apply_augment_points(out, params, use_height)
        if use_height and c_raw != 3:
            out[:, c_out - 1] = h_pre
    elif use_height:
        out[:, c_out - 1] = h_pre
    return out


@pytest.mark.skipif(not native.native_available(), reason="no C compiler")
@pytest.mark.parametrize("c_raw", [3, 7, 135])
@pytest.mark.parametrize("use_height", [True, False])
def test_gather_augment_rows_bitexact(c_raw, use_height):
    """The fused C kernel must match the numpy chain BIT-FOR-BIT across
    seeds, replace-sampling, signed zeros, and both column layouts
    (c_raw == 3: height IS column 3 and gets scaled; c_raw > 3: column 3
    is a feature and the height lands unscaled in the last column)."""
    from vlp3d.data.augment import draw_augment

    for seed in range(4):
        rng = np.random.default_rng(seed)
        n_raw, n = 3000, 4096  # n > n_raw exercises replace sampling
        scene = rng.uniform(-4, 4, (n_raw, c_raw)).astype(np.float32)
        scene[:16] = 0.0
        scene[16:32, :3] = -0.0  # signed-zero edges through flip/scale
        choices = rng.choice(n_raw, n, replace=True).astype(np.int64)
        boxes = rng.uniform(0, 3, (8, 6)).astype(np.float32)
        params, _ = draw_augment(rng, boxes.copy())
        if seed == 3:
            params = None  # eval path: gather + height only
        floor = float(np.float32(-1.25))
        c_out = c_raw + (1 if use_height else 0)
        got = np.empty((n, c_out), np.float32)
        native.gather_augment_rows(
            scene, choices, got, params=params, use_height=use_height,
            floor_height=floor,
        )
        want = _numpy_gather_augment(
            scene, choices, c_out, params, use_height, floor
        )
        np.testing.assert_array_equal(got, want)
