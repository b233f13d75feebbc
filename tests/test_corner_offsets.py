"""corner_offsets_flat / aabb_extents equivalence vs explicit corners."""

import jax.numpy as jnp
import numpy as np

from vlp3d.geometry.boxes import (
    aabb_extents_from_params,
    corner_offsets_flat,
    get_3d_box_batch,
)


def test_offsets_match_corners(rng):
    size = jnp.asarray(rng.uniform(0.3, 2.0, (4, 6, 3)).astype(np.float32))
    heading = jnp.asarray(rng.uniform(-1, 1, (4, 6)).astype(np.float32))
    center = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32))

    corners = np.asarray(get_3d_box_batch(size, heading, center))
    want = (corners - np.asarray(center)[:, :, None, :]).reshape(4, 6, 24)
    got = np.asarray(corner_offsets_flat(size, heading))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # AABB extents
    ext_want = (corners.max(2) - corners.min(2)) / 2
    ext_got = np.asarray(aabb_extents_from_params(size, heading))
    np.testing.assert_allclose(ext_got, ext_want, rtol=1e-5, atol=1e-6)

    # corner mean == center (relation's closed-form substitution)
    np.testing.assert_allclose(
        corners.mean(2), np.asarray(center), rtol=1e-5, atol=1e-5
    )
