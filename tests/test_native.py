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
