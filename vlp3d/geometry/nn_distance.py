"""Chamfer nearest-neighbour distance + huber loss.

Matches `utils/nn_distance.py` in the reference (the numpy double loop in
its demo_nn_distance, nn_distance.py:104-122, is the oracle for our tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_loss(error: jax.Array, delta: float = 1.0) -> jax.Array:
    """0.5 x^2 for |x|<=delta else 0.5 delta^2 + delta(|x|-delta)
    (nn_distance.py:13-31)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.clip(abs_error, max=delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear


def nn_distance(
    pc1: jax.Array,
    pc2: jax.Array,
    *,
    l1smooth: bool = False,
    delta: float = 1.0,
    l1: bool = False,
):
    """Bidirectional nearest-neighbour distance (nn_distance.py:33-61).

    Args:
      pc1: (B, N, C); pc2: (B, M, C).

    Returns:
      dist1 (B, N), idx1 (B, N) int32, dist2 (B, M), idx2 (B, M) int32.
    """
    diff = pc1[:, :, None, :] - pc2[:, None, :, :]  # (B, N, M, C)
    if l1smooth:
        d = jnp.sum(huber_loss(diff, delta), axis=-1)
    elif l1:
        d = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        d = jnp.sum(diff**2, axis=-1)
    dist1 = jnp.min(d, axis=2)
    idx1 = jnp.argmin(d, axis=2).astype(jnp.int32)
    dist2 = jnp.min(d, axis=1)
    idx2 = jnp.argmin(d, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2
