"""Point-axis (sequence) parallelism: shard the N-point axis over devices.

The reference never scales the point axis (40k points fixed, one GPU —
SURVEY §2.7/§5 "long-context": absent). On TPU the point axis IS the
long-context axis of this workload: the raw-point stage (FPS, ball
query, neighbourhood grouping at N points) dominates both memory and
compute, while everything downstream runs at M=2048 centers or fewer.
This module shards that stage over a mesh axis so scenes larger than a
single chip's HBM/VMEM budget run exactly — the "blockwise-gather
problem" SURVEY §5 anticipates, solved with collectives instead of
bigger blocks.

Layout contract: device i of d owns the contiguous global slab
[i*Nl, (i+1)*Nl) of the point axis (Nl = N/d), i.e. the natural
`PartitionSpec(None, "point", ...)` sharding of a (B, N, ...) array.
Because device order equals global scan order, every "first-k in scan
order" rule of the reference kernels merges exactly across shards:

  * FPS (`sampling_gpu.cu:74-178` semantics): each device keeps the
    running min-distance state for its slab; the per-iteration global
    selection is max-of-local-max (pmax) with first-global-index
    tie-break (pmin over masked indices), then the winner's coordinates
    are recovered with a masked psum. Sequential in npoint like the
    dense kernel; the collectives are O(B) scalars per iteration, so
    this trades ICI latency for HBM capacity — use it when the scene
    does not fit, not to make small scenes faster.
  * Ball query (`ball_query_gpu.cu:14-49`): each device runs the dense
    two-level first-k selection on its slab (first nsample in-ball
    LOCAL indices + in-ball count), then an all-gather of the per-shard
    (idx, count) merges them: global slot s comes from the device whose
    cumulative count first exceeds s — scan order is preserved because
    shard order is index order. Pad-with-first / all-zero semantics are
    re-applied on the merged counts.
  * Grouping: global-index gathers against a sharded table become
    gather-what-you-own + psum (each global row has exactly one owner).

Gradients: ball query/FPS are index ops (no grad, as in the reference);
`group_points_sharded` is differentiable through the local gather +
psum (XLA's default colliding-scatter backward — correct, not tuned;
the large-scene path optimizes inference/memory first).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from vlp3d.ops.ball_query import ball_query_with_count
from vlp3d.parallel.mesh import DATA_AXIS

POINT_AXIS = "point"

_MIN_SQ_NORM = 1e-3  # sampling_gpu.cu:105-106
_INF = 1e10


def make_mesh_point(n_point: int, n_data: int = 1) -> Mesh:
    """(data, point) mesh over the first n_data*n_point devices."""
    devices = jax.devices()[: n_data * n_point]
    assert len(devices) == n_data * n_point, (
        f"need {n_data * n_point} devices, have {len(devices)}"
    )
    return Mesh(
        np.asarray(devices).reshape(n_data, n_point),
        (DATA_AXIS, POINT_AXIS),
    )


def fps_sharded(
    xyz: jax.Array, npoint: int, *, axis_name: str = POINT_AXIS
) -> jax.Array:
    """FPS over a point-sharded cloud. Call inside shard_map.

    Args:
      xyz: (B, Nl, 3) local slab of the global (B, N, 3) cloud.
      npoint: number of points to select.

    Returns:
      (B, npoint) int32 GLOBAL indices, identical on every device
      (replicated output — `out_specs=P(...)` without the point axis).
    """
    b, nl, _ = xyz.shape
    xyz = lax.stop_gradient(xyz.astype(jnp.float32))
    shard = lax.axis_index(axis_name)
    off = shard * nl
    valid = jnp.sum(xyz * xyz, axis=-1) > _MIN_SQ_NORM  # (B, Nl)
    lane = jnp.arange(nl, dtype=jnp.int32)[None, :] + off  # global ids

    # the first selected index is always global 0 (owned by shard 0)
    first_owner = shard == 0
    p0 = jnp.where(first_owner, xyz[:, 0, :], 0.0)
    p0 = lax.psum(p0, axis_name)  # (B, 3) coords of global point 0

    def body(i, carry):
        temp, p, idxs = carry
        d = jnp.sum((xyz - p[:, None, :]) ** 2, axis=-1)  # (B, Nl)
        temp = jnp.minimum(temp, d)
        cand = jnp.where(valid, temp, -1.0)
        local_max = jnp.max(cand, axis=1)  # (B,)
        gmax = lax.pmax(local_max, axis_name)  # (B,)
        # first GLOBAL index achieving the global max (ties -> lowest
        # index, i.e. the CUDA kernel's strict `d2 > best` scan)
        at_max = cand == gmax[:, None]
        local_first = jnp.min(
            jnp.where(at_max, lane, jnp.int32(2**30)), axis=1
        )
        best = lax.pmin(local_first, axis_name).astype(jnp.int32)  # (B,)
        # winner coordinates: owned by exactly one shard
        own = (best >= off) & (best < off + nl)
        local_idx = jnp.clip(best - off, 0, nl - 1)
        rows = jnp.take_along_axis(
            xyz, local_idx[:, None, None], axis=1
        )[:, 0, :]
        p = lax.psum(jnp.where(own[:, None], rows, 0.0), axis_name)
        return temp, p, idxs.at[:, i].set(best)

    # initial carries derive from xyz/p0 so their varying-manual-axes
    # (vma) types match the loop body's under shard_map's type checking:
    # temp varies like xyz (data+point); idxs like p0 (data only — the
    # per-iteration pmin makes the selection point-invariant)
    temp0 = xyz[..., 0] * 0.0 + _INF  # (B, Nl)
    izero = (p0[:, :1] * 0.0).astype(jnp.int32)  # (B, 1)
    idxs0 = jnp.zeros((b, npoint), jnp.int32) + izero
    _, _, idxs = lax.fori_loop(1, npoint, body, (temp0, p0, idxs0))
    return idxs


def ball_query_sharded(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    *,
    axis_name: str = POINT_AXIS,
    chunk: int = 256,
) -> jax.Array:
    """Ball query with support points sharded over the point axis.

    Args:
      xyz: (B, Nl, 3) local slab; new_xyz: (B, M, 3) replicated centers.

    Returns:
      (B, M, nsample) int32 GLOBAL indices, replicated. Exactly matches
      dense `ball_query` on the concatenated cloud: shard order is index
      order, so merging per-shard first-k selections in device order
      preserves the global scan-order-first-k rule.
    """
    b, m, _ = new_xyz.shape
    nl = xyz.shape[1]
    d = lax.axis_size(axis_name)
    local_idx, local_cnt = ball_query_with_count(
        radius, nsample, xyz, new_xyz, chunk=chunk
    )
    # per-shard contribution, capped at nsample (no global slot can need
    # more than nsample entries from one shard)
    local_cnt = jnp.minimum(local_cnt, nsample)
    # stack every shard's (first-k ids, count) in shard order. Built with
    # masked-broadcast + psum rather than all_gather: psum output is
    # typed replicated over the axis (shard_map's vma check can then
    # prove the merged result is replicated), all_gather's is not.
    mask = jnp.arange(d) == lax.axis_index(axis_name)  # (d,)
    all_idx = lax.psum(
        jnp.where(mask[:, None, None, None], local_idx[None], 0),
        axis_name,
    )  # (d, B, M, S)
    all_cnt = lax.psum(
        jnp.where(mask[:, None, None], local_cnt[None], 0), axis_name
    )  # (d, B, M)

    ends = jnp.cumsum(all_cnt, axis=0)  # (d, B, M) cumulative counts
    starts = ends - all_cnt
    total = ends[-1]  # (B, M)

    s = jnp.arange(nsample, dtype=jnp.int32)  # global slots
    # owner shard of slot s: first shard whose cumulative end exceeds s
    owner = jnp.sum(
        (ends[..., None] <= s[None, None, None, :]).astype(jnp.int32),
        axis=0,
    )  # (B, M, S)
    owner_c = jnp.minimum(owner, d - 1)
    oh = jax.nn.one_hot(owner_c, d, dtype=jnp.float32)  # (B, M, S, d)
    # local slot within the owner = s - starts[owner]
    start_sel = jnp.einsum(
        "bmsd,dbm->bms", oh, starts.astype(jnp.float32)
    ).astype(jnp.int32)
    t = jnp.clip(s[None, None, :] - start_sel, 0, nsample - 1)
    # pick all_idx[owner, b, m, t] (+ owner's global offset)
    per_shard = jnp.take_along_axis(
        jnp.moveaxis(all_idx, 0, -1),  # (B, M, S, d): slot t from each
        t[..., None],
        axis=2,
    )  # (B, M, S(slots->t), d) -> select slot t rows, still per shard
    picked = jnp.sum(
        per_shard * oh.astype(per_shard.dtype), axis=-1
    )  # (B, M, S) local index on the owner shard
    gidx = picked + owner_c * nl

    slot_valid = s[None, None, :] < total[..., None]
    first = jnp.where(total[..., None] > 0, gidx[..., :1], 0)
    return jnp.where(slot_valid, gidx, first).astype(jnp.int32)


def _owned_rows(points: jax.Array, gidx: jax.Array, axis_name: str):
    """Gather rows of a point-sharded table at global indices, zeroing
    rows this shard does not own. points: (B, Nl, C); gidx: (B, ...)."""
    nl = points.shape[1]
    off = lax.axis_index(axis_name) * nl
    local = gidx - off
    own = (local >= 0) & (local < nl)
    local_c = jnp.clip(local, 0, nl - 1)
    flat = local_c.reshape(local_c.shape[0], -1)
    rows = jnp.take_along_axis(points, flat[..., None], axis=1)
    rows = rows.reshape(*gidx.shape, points.shape[-1])
    return jnp.where(own[..., None], rows, 0.0)


def gather_points_sharded(
    points: jax.Array, gidx: jax.Array, *, axis_name: str = POINT_AXIS
) -> jax.Array:
    """out[b, m, c] = global_points[b, gidx[b, m], c] for a point-sharded
    table; result replicated via psum (each row has exactly one owner)."""
    return lax.psum(_owned_rows(points, gidx, axis_name), axis_name)


def group_points_sharded(
    points: jax.Array, gidx: jax.Array, *, axis_name: str = POINT_AXIS
) -> jax.Array:
    """out[b, m, k, c] = global_points[b, gidx[b, m, k], c], sharded
    table -> replicated output."""
    return lax.psum(_owned_rows(points, gidx, axis_name), axis_name)


def query_and_group_sharded(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array | None = None,
    *,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    axis_name: str = POINT_AXIS,
    chunk: int = 256,
):
    """Point-sharded `query_and_group` (same semantics as
    vlp3d.ops.ball_query.query_and_group / the reference QueryAndGroup,
    pointnet2_utils.py:290-372). xyz/features sharded on the point axis;
    centers replicated; outputs replicated (M is the small axis)."""
    idx = ball_query_sharded(
        radius, nsample, xyz, new_xyz, axis_name=axis_name, chunk=chunk
    )
    grouped_xyz = group_points_sharded(xyz, idx, axis_name=axis_name)
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    if features is not None:
        grouped_feats = group_points_sharded(
            features, idx, axis_name=axis_name
        )
        if use_xyz:
            grouped = jnp.concatenate(
                [grouped_xyz, grouped_feats], axis=-1
            )
        else:
            grouped = grouped_feats
    else:
        if not use_xyz:
            raise ValueError("need features when use_xyz=False")
        grouped = grouped_xyz
    return grouped, grouped_xyz


@functools.lru_cache(maxsize=64)
def large_scene_front(
    mesh: Mesh,
    npoint: int,
    radius: float,
    nsample: int,
    *,
    use_xyz: bool = True,
    normalize_xyz: bool = True,
):
    """Build the point-sharded SA front-end: a function
    (xyz (B, N, 3), features (B, N, C) | None) -> (new_xyz (B, npoint, 3),
    grouped (B, npoint, nsample, 3[+C]), fps_inds (B, npoint)).

    The input arrays are consumed with `P(data, point)` sharding over the
    mesh; every output is small (M = npoint) and comes back sharded over
    the data axis only, ready for the dense remainder of the backbone.
    This is the memory-capacity path: a scene too large for one chip is
    laid out over the point axis, and only O(M·nsample) data ever
    materializes per device.

    lru_cached on (mesh, geometry): jit/trace caches key on function
    identity, so rebuilding the shard_map per call would recompile the
    npoint-iteration FPS loop every batch.
    """
    from jax import shard_map

    has_data = DATA_AXIS in mesh.axis_names
    dspec = DATA_AXIS if has_data else None
    in_x = P(dspec, POINT_AXIS, None)
    out_small = P(dspec)

    def body(xyz, features):
        fps_idx = fps_sharded(xyz, npoint)
        new_xyz = gather_points_sharded(xyz, fps_idx)
        grouped, _ = query_and_group_sharded(
            radius,
            nsample,
            xyz,
            new_xyz,
            features,
            use_xyz=use_xyz,
            normalize_xyz=normalize_xyz,
        )
        return new_xyz, grouped, fps_idx

    # both variants built ONCE so their identities are stable across calls
    fn_nofeat = shard_map(
        lambda x: body(x, None),
        mesh=mesh,
        in_specs=(in_x,),
        out_specs=(out_small, out_small, out_small),
    )
    fn_feat = shard_map(
        body,
        mesh=mesh,
        in_specs=(in_x, P(dspec, POINT_AXIS, None)),
        out_specs=(out_small, out_small, out_small),
    )

    def run(xyz, features=None):
        if features is None:
            return fn_nofeat(xyz)
        return fn_feat(xyz, features)

    return run
