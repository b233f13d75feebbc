"""Fixed-shape radius neighbourhood search (ball query).

Semantics match the reference CUDA kernel
(`lib/pointnet2/_ext_src/src/ball_query_gpu.cu:14-49`):

  * for each query center, return the indices of the first ``nsample``
    points (in scan order k = 0..N-1) with squared distance strictly less
    than radius**2;
  * if fewer than ``nsample`` points fall inside the ball, the remaining
    slots are padded with the *first* in-ball index
    (ball_query_gpu.cu:38-43);
  * if no point falls inside the ball, all slots are 0 (the reference
    allocates the output with torch::zeros, ball_query.cpp:25).

The fixed-shape first-k selection is a two-level block-count search (see
``_ball_query_chunk``): per-block in-ball counts locate each rank's block,
then a local cumsum on the gathered target block finds the exact index —
no sorts, no while loops, no full-length cumsum (each of which was a
measured multi-hundred-ms bottleneck on chip at 40k points).

Distance matrices are computed in center chunks to bound transient HBM
footprint (chunk x N instead of M x N).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax


def _ball_query_chunk(centers, xyz, radius, nsample):
    """centers: (B, C, 3), xyz: (B, N, 3) -> idx (B, C, nsample) i32.

    Two-level block-count first-k selection: the s-th neighbour is the
    first index whose running in-ball count reaches s+1; block-level sums
    locate the block, a local cumsum of the gathered block finds the
    offset. O(N + S·blk) per center, fully vectorized.
    """
    b, c, _ = centers.shape
    n = xyz.shape[1]
    blk = 128
    pad = (-n) % blk
    # d2 as explicit per-component FMAs, NOT a sum-reduce over the size-3
    # axis: a reduce forces a fusion boundary that materializes the f32
    # (B, C, N) distance tensor to HBM before the compare (~9ms/step of
    # kLoop fusions at SA1 shapes); elementwise adds let the whole
    # distance+compare+convert chain fuse into one s8-producing loop.
    # The summation order (dx2+dy2)+dz2 matches the oracle/CUDA kernel
    # exactly, so boundary decisions are bit-identical.
    dx = centers[:, :, None, 0] - xyz[:, None, :, 0]
    dy = centers[:, :, None, 1] - xyz[:, None, :, 1]
    dz = centers[:, :, None, 2] - xyz[:, None, :, 2]
    d2 = dx * dx + dy * dy + dz * dz  # (B, C, N)
    in_ball = (d2 < radius * radius).astype(jnp.int8)
    if pad:
        in_ball = jnp.pad(in_ball, ((0, 0), (0, 0), (0, pad)))
    nb = in_ball.shape[-1] // blk
    m_blocks = in_ball.reshape(b, c, nb, blk)

    # Two-level count-based search for "first index whose running in-ball
    # count reaches s+1" (s = 0..nsample-1), with only BLOCK-level prefix
    # sums — no full-length cumsum is materialized (the (B, C, N) int32
    # cumsum was the next bandwidth whale after searchsorted, ~53ms/step)
    # and no while loops (a vmapped searchsorted costs ~16 gather steps).
    block_sums = jnp.sum(m_blocks.astype(jnp.int32), axis=-1)  # (B, C, NB)
    block_end = jnp.cumsum(block_sums, axis=-1)
    block_start = block_end - block_sums
    count = block_end[..., -1]  # (B, C)

    targets = jnp.arange(1, nsample + 1, dtype=jnp.int32)  # (S,)
    # first block whose end-count reaches the target
    bstar = jnp.sum(
        (block_end[..., None] < targets[None, None, None, :]).astype(
            jnp.int32
        ),
        axis=2,
    )  # (B, C, S)
    bstar_c = jnp.minimum(bstar, nb - 1)
    # Select each slot's target block row and start count via one-hot
    # batched matmuls on the MXU. The equivalent take_along_axis gathers
    # lower to kCustom row-gathers that cost ~25ms/step at SA1 shapes
    # (one of them 10ms to move 0.5MB); the matmuls cost <1ms. one-hot
    # rows are exact in bf16; block_start (<= N <= 2^24) needs f32.
    oh = jax.nn.one_hot(bstar_c, nb, dtype=jnp.bfloat16)  # (B, C, S, NB)
    rows_mask = jnp.einsum(
        "bcsn,bcnk->bcsk",
        oh,
        m_blocks.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (B, C, S, blk) 0/1 values
    start_sel = jnp.einsum(
        "bcsn,bcn->bcs",
        oh.astype(jnp.float32),
        block_start.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)  # (B, C, S)
    # inclusive 128-lane cumsum as a triangular-ones matmul on the MXU
    # (exact: 0/1 inputs, counts <= 128; the int32 lane cumsum lowering
    # was ~2x slower)
    tril = jnp.tril(jnp.ones((blk, blk), jnp.bfloat16)).T
    local_cum = jnp.einsum(
        "bcsk,kl->bcsl",
        rows_mask.astype(jnp.bfloat16),
        tril,
        preferred_element_type=jnp.float32,
    )
    t_local = (targets[None, None, :] - start_sel).astype(jnp.float32)
    within = jnp.sum(
        (local_cum < t_local[..., None]).astype(jnp.int32), axis=-1
    )  # (B, C, S)
    idx = bstar_c * blk + within

    slot_valid = targets[None, None, :] <= count[..., None]
    first = jnp.where(count[..., None] > 0, idx[..., :1], 0)
    padded = jnp.where(slot_valid, jnp.minimum(idx, n - 1), first).astype(
        jnp.int32
    )
    return padded, count


def ball_query(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    chunk: int = 256,
) -> jax.Array:
    """Radius search with fixed-shape output.

    Args:
      radius: ball radius.
      nsample: neighbours per center (output is padded to this).
      xyz: (B, N, 3) support points.
      new_xyz: (B, M, 3) query centers.
      chunk: centers processed per step (caps the (chunk, N) distance tile).

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    return ball_query_with_count(
        radius, nsample, xyz, new_xyz, chunk=chunk
    )[0]


def ball_query_with_count(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    chunk: int = 256,
) -> tuple[jax.Array, jax.Array]:
    """Like :func:`ball_query`, but also returns the per-center in-ball
    count (B, M) int32 (the number of support points strictly inside the
    radius, before padding). Used by the point-sharded merge
    (vlp3d.parallel.point_parallel), which needs to know how many valid
    neighbours each shard contributed."""
    b, m, _ = new_xyz.shape
    xyz = lax.stop_gradient(xyz.astype(jnp.float32))
    new_xyz = lax.stop_gradient(new_xyz.astype(jnp.float32))
    if m <= chunk:
        return _ball_query_chunk(new_xyz, xyz, radius, nsample)

    pad = (-m) % chunk
    centers = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))
    nchunks = centers.shape[1] // chunk

    def one(i):
        c = lax.dynamic_slice(centers, (0, i * chunk, 0), (b, chunk, 3))
        return _ball_query_chunk(c, xyz, radius, nsample)

    out, cnt = lax.map(one, jnp.arange(nchunks))
    out = jnp.moveaxis(out, 0, 1).reshape(b, nchunks * chunk, nsample)
    cnt = jnp.moveaxis(cnt, 0, 1).reshape(b, nchunks * chunk)
    return out[:, :m], cnt[:, :m]


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array | None = None,
    *,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    chunk: int = 256,
    remat_tag: bool = False,
):
    """Ball query + grouping, channels-last.

    Mirrors ``QueryAndGroup`` (`lib/pointnet2/pointnet2_utils.py:290-372`):
    grouped coordinates are recentered on the query point and optionally
    normalized by the radius; point features are gathered per neighbour and
    concatenated after the xyz channels.

    Args:
      xyz: (B, N, 3); new_xyz: (B, M, 3); features: (B, N, C) or None.

    Returns:
      (grouped, grouped_xyz): grouped is (B, M, nsample, 3 + C) if use_xyz
      else (B, M, nsample, C); grouped_xyz is (B, M, nsample, 3).
    """
    from vlp3d.ops.grouping import group_points

    idx = ball_query(radius, nsample, xyz, new_xyz, chunk=chunk)
    if remat_tag:
        # remat residual tag (see vlp3d.models.layers.POINT_INDS): keep
        # the selection indices as saved residuals under a
        # save_only_these_names("point_inds") checkpoint policy. Off by
        # default so non-remat programs carry no name primitives.
        from jax.ad_checkpoint import checkpoint_name

        idx = checkpoint_name(idx, "point_inds")
    grouped_xyz = group_points(xyz, idx)  # (B, M, nsample, 3)
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius

    if features is not None:
        grouped_feats = group_points(features, idx)  # (B, M, nsample, C)
        if use_xyz:
            grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        else:
            grouped = grouped_feats
    else:
        if not use_xyz:
            raise ValueError("need features when use_xyz=False")
        grouped = grouped_xyz
    return grouped, grouped_xyz
