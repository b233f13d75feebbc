"""Rotated BEV box overlap / IoU / NMS — TPU-native.

Replaces the OpenPCDet CUDA kernels vendored at
`models/pointpillars/ops/iou3d/iou3d_kernel.cu` (boxes_overlap_bev,
boxes_iou_bev, nms_gpu / nms_normal_gpu; box format (5,) =
[x1, y1, x2, y2, angle] with rotation about the box center).

The exact convex polygon intersection becomes a fixed-shape
Sutherland-Hodgman clip: the 4-gon of box A clipped against the 4
half-planes of box B yields at most 8 vertices, tracked with a padded
(16, 2) vertex buffer + count. Everything vmaps over (N, M) pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MAXV = 16


def box_to_corners(box: jax.Array) -> jax.Array:
    """(5,) [x1,y1,x2,y2,angle] -> (4, 2) corners (counter-clockwise)."""
    cx = (box[0] + box[2]) / 2.0
    cy = (box[1] + box[3]) / 2.0
    hx = (box[2] - box[0]) / 2.0
    hy = (box[3] - box[1]) / 2.0
    c, s = jnp.cos(box[4]), jnp.sin(box[4])
    local = jnp.array(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]
    ) * jnp.array([hx, hy])
    rot = jnp.array([[c, -s], [s, c]])
    return local @ rot.T + jnp.array([cx, cy])


def _clip_halfplane(verts, count, a, b):
    """Clip padded polygon (verts (_MAXV,2), count) by the half-plane on the
    left of edge a->b."""
    d = b - a

    def signed(p):
        return d[0] * (p[:, 1] - a[1]) - d[1] * (p[:, 0] - a[0])

    idx = jnp.arange(_MAXV)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = verts
    nxt_v = verts[nxt]
    s_cur = signed(cur)
    s_nxt = signed(nxt_v)
    inside_cur = s_cur >= 0
    inside_nxt = s_nxt >= 0

    t = s_cur / jnp.where(
        jnp.abs(s_cur - s_nxt) < 1e-12, 1e-12, s_cur - s_nxt
    )
    inter = cur + (nxt_v - cur) * t[:, None]

    # each edge emits up to 2 vertices: cur (if inside) and the
    # intersection (if the edge crosses the plane)
    emit_cur = inside_cur & (idx < count)
    emit_int = (inside_cur != inside_nxt) & (idx < count)
    emit = jnp.stack([emit_cur, emit_int], axis=1).reshape(-1)  # (2*_MAXV,)
    pts = jnp.stack([cur, inter], axis=1).reshape(-1, 2)

    # compact emitted points: scatter to their cumulative positions, with
    # non-emitted writes routed to an overflow row that is sliced off
    pos = jnp.cumsum(emit.astype(jnp.int32)) - 1
    out = jnp.zeros((_MAXV + 1, 2)).at[
        jnp.where(emit, pos, _MAXV)
    ].set(pts)[: _MAXV]
    return out, jnp.sum(emit.astype(jnp.int32))


def _poly_area(verts, count):
    idx = jnp.arange(_MAXV)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    cross = (
        verts[:, 0] * verts[nxt, 1] - verts[nxt, 0] * verts[:, 1]
    )
    cross = jnp.where(idx < count, cross, 0.0)
    return jnp.abs(jnp.sum(cross)) / 2.0


def _pair_overlap(box_a, box_b):
    ca = box_to_corners(box_a)
    cb = box_to_corners(box_b)
    verts = jnp.zeros((_MAXV, 2)).at[:4].set(ca)
    count = jnp.int32(4)
    for k in range(4):
        verts, count = _clip_halfplane(
            verts, count, cb[k], cb[(k + 1) % 4]
        )
    return jnp.where(count >= 3, _poly_area(verts, count), 0.0)


@functools.partial(jax.jit, static_argnames=())
def boxes_overlap_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(N, 5) x (M, 5) -> (N, M) rotated intersection areas."""
    return jax.vmap(
        lambda a: jax.vmap(lambda b: _pair_overlap(a, b))(boxes_b)
    )(boxes_a)


def boxes_iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """(N, 5) x (M, 5) -> (N, M) rotated BEV IoU (iou3d_kernel.cu:268-306)."""
    inter = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    return inter / jnp.clip(
        area_a[:, None] + area_b[None, :] - inter, min=1e-8
    )


def nms_rotated(
    boxes: jax.Array, scores: jax.Array, thresh: float
) -> jax.Array:
    """Greedy rotated NMS (nms_gpu semantics): returns a keep mask (N,).
    Fixed-shape fori_loop over score-ranked boxes."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    ious = boxes_iou_bev(boxes[order], boxes[order])  # (N, N) ranked

    def body(i, alive):
        keep_i = alive[i]
        suppress = (ious[i] > thresh) & keep_i
        suppress = suppress.at[i].set(False)
        return alive & jnp.logical_not(suppress)

    alive = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(alive)
    return keep


def nms_normal(boxes: jax.Array, scores: jax.Array, thresh: float):
    """Axis-aligned variant (nms_normal_gpu): ignores the angle."""
    b = boxes.at[:, 4].set(0.0)
    return nms_rotated(b, scores, thresh)
