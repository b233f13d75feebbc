"""Hard/dynamic voxelization (PointPillars) — fixed-shape TPU rewrite.

Port of the reference CUDA/CPU voxelization
(`models/pointpillars/ops/voxelization/voxelization_cpu.cpp:7-100`,
wrapped by ops/voxel_module.py:8-120):

  * dynamic: per-point integer voxel coords, -1 outside the range, stored
    (z, y, x) and flipped to (x, y, z) on return;
  * hard: voxels are allocated in point-scan order (first point in a new
    cell allocates the next voxel id), each voxel keeps the first
    `max_points` points in scan order, allocation stops at `max_voxels`.

The sequential first-come-first-served loop becomes a stable sort over
(cell_key, point_index): the segment head of each cell is its first point,
voxel ids are the scan-order ranks of segment heads, and each point's slot
is its rank within the segment. Outputs are PADDED to (max_voxels, ...)
with a validity count (fixed shapes; the reference slices dynamically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dynamic_voxelize(points, voxel_size, coors_range):
    """points (N, >=3) -> coords (N, 3) i32 in (x, y, z); -1 if outside."""
    p = points[:, :3]
    vs = jnp.asarray(voxel_size, jnp.float32)
    lo = jnp.asarray(coors_range[:3], jnp.float32)
    hi = jnp.asarray(coors_range[3:], jnp.float32)
    grid = jnp.round((hi - lo) / vs).astype(jnp.int32)
    c = jnp.floor((p - lo) / vs).astype(jnp.int32)
    valid = jnp.all((c >= 0) & (c < grid), axis=1)
    return jnp.where(valid[:, None], c, -1), grid


def hard_voxelize(
    points: jax.Array,
    voxel_size,
    coors_range,
    max_points: int = 35,
    max_voxels: int = 20000,
):
    """Fixed-shape hard voxelization.

    Returns dict:
      voxels (max_voxels, max_points, C); coors (max_voxels, 3) i32 (x,y,z),
      -1 padded; num_points_per_voxel (max_voxels,); voxel_num scalar;
      voxel_mask (max_voxels,) bool.
    """
    n, c_feat = points.shape
    coords, grid = dynamic_voxelize(points, voxel_size, coors_range)
    valid = coords[:, 0] >= 0

    # linear cell key; invalid points get a sentinel key that sorts last
    key = (
        coords[:, 2] * grid[1] * grid[0]
        + coords[:, 1] * grid[0]
        + coords[:, 0]
    )
    big = grid[0] * grid[1] * grid[2] + 1
    key = jnp.where(valid, key, big)

    # stable sort by key: within a cell, points keep scan order
    order = jnp.argsort(key, stable=True)
    key_s = key[order]

    # segment structure on the sorted array
    is_head_s = jnp.concatenate(
        [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
    )
    seg_id_s = jnp.cumsum(is_head_s) - 1  # dense segment index (sorted order)
    pos_s = jnp.arange(n)
    # each segment has exactly one head -> sum == that head's position
    seg_head_pos = jax.ops.segment_sum(
        jnp.where(is_head_s, pos_s, 0), seg_id_s, num_segments=n
    )
    slot_s = pos_s - seg_head_pos[seg_id_s]  # rank within cell (scan order)

    # voxel id = scan-order rank of the cell's FIRST point. The first point
    # of each cell is the one with the smallest original index; since the
    # sort is stable, that is the segment head. Rank heads by their
    # original point index. (segment_sum-based reductions: empty segments
    # give 0, avoiding segment_max's INT_MIN identity.)
    first_idx_per_seg = jax.ops.segment_sum(
        jnp.where(is_head_s, order, 0), seg_id_s, num_segments=n
    )
    seg_valid = jax.ops.segment_sum(
        (is_head_s & (key_s < big)).astype(jnp.int32),
        seg_id_s,
        num_segments=n,
    )
    alloc_key = jnp.where(seg_valid > 0, first_idx_per_seg, n + 1)
    seg_rank = jnp.argsort(jnp.argsort(alloc_key))  # rank per segment

    voxel_id_s = seg_rank[seg_id_s]
    keep_s = (
        (key_s < big)
        & (voxel_id_s < max_voxels)
        & (slot_s < max_points)
    )

    # scatter points into the padded voxel tensor
    safe_v = jnp.where(keep_s, voxel_id_s, max_voxels)
    safe_p = jnp.where(keep_s, slot_s, 0)
    voxels = jnp.zeros((max_voxels + 1, max_points, c_feat), points.dtype)
    voxels = voxels.at[safe_v, safe_p].set(points[order])
    voxels = voxels[:max_voxels]

    num_per_voxel = jax.ops.segment_sum(
        keep_s.astype(jnp.int32), safe_v, num_segments=max_voxels + 1
    )[:max_voxels]

    coors = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    coors = coors.at[safe_v].set(coords[order])
    coors = coors[:max_voxels]

    n_cells = jnp.sum(is_head_s & (key_s < big))
    voxel_num = jnp.minimum(n_cells, max_voxels)
    voxel_mask = jnp.arange(max_voxels) < voxel_num
    coors = jnp.where(voxel_mask[:, None], coors, -1)
    return {
        "voxels": voxels,
        "coors": coors,
        "num_points_per_voxel": num_per_voxel * voxel_mask,
        "voxel_num": voxel_num,
        "voxel_mask": voxel_mask,
    }
