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


def _sorted_scatter_add(g_flat: jax.Array, idx_flat: jax.Array, n: int):
    """Transpose of a row gather: sum cotangent rows into their source rows.

    XLA's default gather-transpose is a scatter-add with colliding indices,
    which serializes catastrophically on TPU (the un-customized SA backward
    measured ~70 s/step at production shapes). Sorting the indices first
    makes duplicates consecutive so the scatter uses the sorted fast path:
    sort keys (cheap), permute rows (a gather), segment-sum.
    """
    order = jnp.argsort(idx_flat)
    idx_s = idx_flat[order]
    g_s = jnp.take(g_flat, order, axis=0)
    return jax.ops.segment_sum(
        g_s, idx_s, num_segments=n, indices_are_sorted=True
    )


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b, m, c] = points[b, idx[b, m], c].

    points: (B, N, C); idx: (B, M) int -> (B, M, C). Backward is the
    sorted scatter-add (the reference's atomicAdd kernel,
    sampling_gpu.cu:39-52, done the TPU way).
    """
    return _gather_points_vjp(points, idx)


@jax.custom_vjp
def _gather_points_vjp(points, idx):
    return jnp.take_along_axis(points, idx[:, :, None], axis=1)


def _gather_points_fwd(points, idx):
    return _gather_points_vjp(points, idx), (points.shape, idx)


def _gather_points_bwd(res, g):
    points_shape, idx = res
    b, n, c = points_shape
    dpoints = jax.vmap(
        lambda gb, ib: _sorted_scatter_add(gb, ib, n)
    )(g, idx)
    return dpoints, None


_gather_points_vjp.defvjp(_gather_points_fwd, _gather_points_bwd)


_FAST_GATHER_MAX_ROWS = 1 << 18  # measured TPU cliff: tables with >= 2^18
# rows gather at ~11.7 ns/row; below it ~3.1 ns/row (4x). Batched gathers
# never take the fast path, so flatten batches into per-group tables.


def _grouped_row_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather restructured for the TPU fast path: split the batch into
    groups whose flattened (g*N, C) tables stay under 2^18 rows, each
    behind an optimization_barrier so XLA cannot fuse the batch slice back
    into one big-table (slow-path) gather. (A single pair-folded gather
    over the full table measured SLOWER — the fast path is sensitive to
    the index/table producers, not just table row count.)"""
    b, n, c = points.shape
    m, k = idx.shape[1], idx.shape[2]
    g = max(1, min(b, _FAST_GATHER_MAX_ROWS // max(n, 1)))
    while b % g:
        g -= 1
    if g == b and b * n >= _FAST_GATHER_MAX_ROWS:
        g = 1
    offs = (jnp.arange(g, dtype=idx.dtype) * n)[:, None, None]

    def take_spans(tbl, gi):
        tbl = jax.lax.optimization_barrier(tbl)
        if c <= 128:
            return jnp.take(tbl, gi, axis=0)
        # rows crossing one 128-lane tile gather ~3x slower per row
        # regardless of width; gather 128-lane spans separately
        spans = [
            jnp.take(tbl[:, s : s + 128], gi, axis=0)
            for s in range(0, c, 128)
        ]
        return jnp.concatenate(spans, axis=-1)

    if g == b:
        out = take_spans(
            points.reshape(b * n, c), (idx + offs[:b]).reshape(-1)
        )
    else:
        # lax.map keeps every group's gather on the identical (fast-path)
        # code path; an unrolled loop left later groups ~7x slower
        xg = points.reshape(b // g, g * n, c)
        ig = (
            idx.reshape(b // g, g, m, k) + offs[None]
        ).reshape(b // g, g * m * k)
        out = jax.lax.map(lambda args: take_spans(*args), (xg, ig))
    return out.reshape(b, m, k, c)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """out[b, m, k, c] = points[b, idx[b, m, k], c].

    points: (B, N, C); idx: (B, M, K) int -> (B, M, K, C). Backward is the
    sorted scatter-add (group_points_gpu.cu's atomicAdd, the TPU way).
    """
    return _group_points_vjp(points, idx)


@jax.custom_vjp
def _group_points_vjp(points, idx):
    return _grouped_row_gather(points, idx)


def _group_points_fwd(points, idx):
    return _group_points_vjp(points, idx), (points.shape, idx)


def _group_points_bwd(res, g):
    points_shape, idx = res
    b, n, c = points_shape
    _, m, k, _ = g.shape
    g_flat = g.reshape(b, m * k, c)
    idx_flat = idx.reshape(b, m * k)
    dpoints = jax.vmap(
        lambda gb, ib: _sorted_scatter_add(gb, ib, n)
    )(g_flat, idx_flat)
    return dpoints, None


_group_points_vjp.defvjp(_group_points_fwd, _group_points_bwd)
