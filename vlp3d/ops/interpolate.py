"""Three-nearest-neighbour feature interpolation.

Matches the reference CUDA kernels
(`lib/pointnet2/_ext_src/src/interpolate_gpu.cu:14-64` — note the kernel
returns *squared* distances) and the inverse-distance weighting applied by
``PointnetFPModule`` (`lib/pointnet2/pointnet2_modules.py:393-401`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def three_nn(unknown: jax.Array, known: jax.Array):
    """3 nearest neighbours of each `unknown` point among `known` points.

    Args:
      unknown: (B, N, 3); known: (B, M, 3).

    Returns:
      dist2: (B, N, 3) squared distances, ascending;
      idx:   (B, N, 3) int32 indices into M (ties -> lowest index, matching
             the strict-< scan in interpolate_gpu.cu:38-55).
    """
    d2 = jnp.sum(
        (unknown[:, :, None, :] - known[:, None, :, :]) ** 2, axis=-1
    )  # (B, N, M)
    # 3 iterative min-extractions instead of lax.top_k: top_k lowers to a
    # full bitonic sort of the (B, N, M) distance matrix (PERF.md
    # pathology #2). Lowest-index-of-min tie-break matches top_k's stable
    # order and the CUDA strict-< scan.
    m = d2.shape[-1]
    lane = jnp.arange(m, dtype=jnp.int32)
    cur = d2
    dists, idxs = [], []
    for _ in range(3):
        mn = jnp.min(cur, axis=-1, keepdims=True)  # (B, N, 1)
        ix = jnp.min(
            jnp.where(cur == mn, lane, m), axis=-1
        ).astype(jnp.int32)  # (B, N)
        dists.append(mn[..., 0])
        idxs.append(ix)
        cur = jnp.where(lane == ix[..., None], jnp.inf, cur)
    return jnp.stack(dists, axis=-1), jnp.stack(idxs, axis=-1)


def three_interpolate(
    features: jax.Array, idx: jax.Array, weight: jax.Array
) -> jax.Array:
    """Weighted sum of 3 neighbour features.

    features: (B, M, C); idx: (B, N, 3); weight: (B, N, 3) -> (B, N, C).
    """
    gathered = jnp.take_along_axis(
        features[:, :, None, :], idx[:, :, :, None], axis=1
    )  # (B, N, 3, C)
    return jnp.sum(gathered * weight[:, :, :, None], axis=2)


def interpolate_features(
    unknown: jax.Array, known: jax.Array, known_feats: jax.Array
) -> jax.Array:
    """three_nn + inverse-distance weighting, as in the FP module.

    Weights are 1/(sqrt(d2) + 1e-8) normalized over the 3 neighbours:
    the reference's three_nn WRAPPER returns euclidean distances
    (torch.sqrt at pointnet2_utils.py:139), which feed 1/(dist + 1e-8)
    at pointnet2_modules.py:395-397. Pinned against the reference
    PointnetFPModule in tests/test_refparity_backbone.py.
    """
    dist2, idx = three_nn(unknown, known)
    dist2 = lax.stop_gradient(dist2)
    recip = 1.0 / (jnp.sqrt(dist2) + 1e-8)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)
    return three_interpolate(known_feats, idx, weight)
