"""Furthest point sampling (FPS) — TPU-native.

Semantics match the reference CUDA kernel
(`lib/pointnet2/_ext_src/src/sampling_gpu.cu:74-178`):

  * the first selected index is always 0;
  * points with squared norm <= 1e-3 are never selected (padding points at
    the origin are skipped, sampling_gpu.cu:105-106);
  * each step selects the point maximizing its min squared distance to the
    already-selected set; ties resolve to the lowest index;
  * forward-only (no gradient), like the reference autograd.Function
    (`lib/pointnet2/pointnet2_utils.py:73-75`).

Two implementations:

  * ``impl='xla'`` — `lax.fori_loop` over selection steps, vmapped over the
    batch; runs anywhere (CPU tests, fallback).
  * ``impl='pallas'`` — one Mosaic kernel per batch *chunk*: coordinates,
    the running min-distance state, and the selected-index vector all stay
    in VMEM for the whole sweep (a single HBM read of the points, zero
    intermediate HBM traffic). The batch rides the sublane axis so every
    per-iteration vector op is amortized across all batch rows — FPS is
    sequential in npoint but embarrassingly parallel over B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MIN_SQ_NORM = 1e-3
_INF = 1e10


def _fps_one_xla(xyz: jax.Array, npoint: int) -> jax.Array:
    """FPS over one point cloud. xyz: (N, 3) f32 -> (npoint,) i32."""
    n = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)
    valid = jnp.sum(xyz * xyz, axis=-1) > _MIN_SQ_NORM

    def body(i, carry):
        temp, old, idxs = carry
        p = xyz[old]
        d = jnp.sum((xyz - p[None, :]) ** 2, axis=-1)
        temp = jnp.minimum(temp, d)
        best = jnp.argmax(jnp.where(valid, temp, -1.0)).astype(jnp.int32)
        return temp, best, idxs.at[i].set(best)

    temp0 = jnp.full((n,), _INF, jnp.float32)
    idxs0 = jnp.zeros((npoint,), jnp.int32)
    _, _, idxs = lax.fori_loop(1, npoint, body, (temp0, jnp.int32(0), idxs0))
    return idxs


def _fps_pallas_kernel(xyz_ref, out_ref, temp_ref, *, npoint: int, n: int, b: int):
    # xyz_ref: (3, b, n) VMEM — planes x, y, z; batch rows on sublanes.
    # out_ref: (b, npoint) i32 VMEM.
    # temp_ref: (b, n) f32 VMEM scratch — running min distance, mutated in
    # place (a loop-carried value would be re-copied every iteration).
    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    lane_m = jax.lax.broadcasted_iota(jnp.int32, (b, npoint), 1)
    valid = (x * x + y * y + z * z) > _MIN_SQ_NORM
    temp_ref[:, :] = jnp.full((b, n), _INF, jnp.float32)

    def body(j, carry):
        old, idxs = carry  # old: (b, 1) i32
        sel = lane_n == old
        px = jnp.sum(jnp.where(sel, x, 0.0), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(sel, y, 0.0), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(sel, z, 0.0), axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        temp = jnp.minimum(temp_ref[:, :], d)
        temp_ref[:, :] = temp
        cand = jnp.where(valid, temp, -1.0)
        m = jnp.max(cand, axis=1, keepdims=True)
        # first index achieving the max (CUDA's strict `d2 > best` scan)
        best = jnp.min(
            jnp.where(cand == m, lane_n, n), axis=1, keepdims=True
        ).astype(jnp.int32)
        idxs = jnp.where(lane_m == j, best, idxs)
        return best, idxs

    idxs0 = jnp.zeros((b, npoint), jnp.int32)
    old0 = jnp.zeros((b, 1), jnp.int32)
    _, idxs = lax.fori_loop(1, npoint, body, (old0, idxs0))
    out_ref[:, :] = idxs


def _fps_pallas(xyz: jax.Array, npoint: int, *, bchunk: int = 8) -> jax.Array:
    b, n, _ = xyz.shape
    pad_b = (-b) % bchunk
    # Zero-padded rows are all-invalid; FPS over them returns index 0
    # everywhere — harmless, sliced off below.
    xyz_t = jnp.moveaxis(xyz.astype(jnp.float32), -1, 0)  # (3, B, n)
    if pad_b:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, pad_b), (0, 0)))
    nb = (b + pad_b) // bchunk
    kernel = functools.partial(_fps_pallas_kernel, npoint=npoint, n=n, b=bchunk)

    def one(chunk):  # (3, bchunk, n) -> (bchunk, npoint)
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bchunk, npoint), jnp.int32),
            scratch_shapes=[pltpu.VMEM((bchunk, n), jnp.float32)],
        )(chunk)

    if nb == 1:
        return one(xyz_t)[:b]
    # one pallas_call per 8-row slice (lax.map, not a pallas grid): a
    # batch-gridded call double-buffers the (3, 8, N) input block and
    # blows the 16 MB VMEM budget at 40960 points x batch >= 16
    chunks = xyz_t.reshape(3, nb, bchunk, n)
    out = lax.map(one, jnp.moveaxis(chunks, 1, 0))  # (nb, bchunk, npoint)
    return out.reshape(nb * bchunk, npoint)[:b]


def furthest_point_sample(
    xyz: jax.Array, npoint: int, *, impl: str = "auto"
) -> jax.Array:
    """Iterative furthest point sampling.

    Args:
      xyz: (B, N, 3) float array of point coordinates.
      npoint: number of points to select.
      impl: 'auto' | 'xla' | 'pallas'.

    Returns:
      (B, npoint) int32 indices into N. No gradient flows through this op.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() != "cpu" else "xla"
    xyz = lax.stop_gradient(xyz)
    if impl == "pallas":
        return _fps_pallas(xyz, npoint)
    return jax.vmap(functools.partial(_fps_one_xla, npoint=npoint))(xyz)
