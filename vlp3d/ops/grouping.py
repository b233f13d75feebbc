"""Index gather/group ops, channels-last.

TPU-native replacements for the reference CUDA gather/group kernels
(`lib/pointnet2/_ext_src/src/sampling_gpu.cu:13-25`,
`group_points_gpu.cu`). In JAX these are `take_along_axis` gathers whose
scatter-add backward passes come from autodiff for free — no custom VJPs
(the reference hand-writes atomicAdd backward kernels,
sampling_gpu.cu:39-52).

Convention: features are channels-LAST (B, N, C) throughout this framework
(the reference is channels-first (B, C, N) because of torch Conv1d). The
feature axis maps to TPU lanes, so 128-d features tile exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b, m, c] = points[b, idx[b, m], c].

    points: (B, N, C); idx: (B, M) int -> (B, M, C).
    """
    return jnp.take_along_axis(points, idx[:, :, None], axis=1)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b, m, k, c] = points[b, idx[b, m, k], c].

    points: (B, N, C); idx: (B, M, K) int -> (B, M, K, C).
    """
    return jnp.take_along_axis(
        points[:, :, None, :], idx[:, :, :, None], axis=1
    )
