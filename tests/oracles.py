"""Pure-numpy oracles mirroring the reference CUDA kernel semantics.

Each oracle is a direct transcription of the scan-order logic in the
reference kernels (sampling_gpu.cu, ball_query_gpu.cu, interpolate_gpu.cu)
so op tests assert exact index-level parity.
"""

import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """sampling_gpu.cu:74-178 — start at 0, skip |p|^2<=1e-3, first-max ties."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        pts = xyz[bi]
        valid = (pts**2).sum(-1) > 1e-3
        temp = np.full(n, 1e10, np.float64)
        old = 0
        out[bi, 0] = 0
        for j in range(1, npoint):
            d = ((pts - pts[old]) ** 2).sum(-1)
            temp = np.minimum(temp, d)
            cand = np.where(valid, temp, -1.0)
            old = int(np.argmax(cand))  # first max wins, like d2 > best
            out[bi, j] = old
    return out


def ball_query_oracle(radius, nsample, xyz, new_xyz) -> np.ndarray:
    """ball_query_gpu.cu:14-49 — first nsample in scan order, pad-with-first,
    zeros when empty."""
    b, m, _ = new_xyz.shape
    out = np.zeros((b, m, nsample), np.int32)
    r2 = radius * radius
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(xyz.shape[1]):
                d2 = ((new_xyz[bi, j] - xyz[bi, k]) ** 2).sum()
                if d2 < r2:
                    if cnt == 0:
                        out[bi, j, :] = k
                    out[bi, j, cnt] = k
                    cnt += 1
                    if cnt == nsample:
                        break
    return out


def three_nn_oracle(unknown, known):
    """interpolate_gpu.cu:14-64 — 3 smallest squared distances, strict <."""
    b, n, _ = unknown.shape
    d2 = ((unknown[:, :, None, :] - known[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :3].astype(np.int32)
    dist = np.take_along_axis(d2, idx, axis=-1)
    return dist, idx


def nn_distance_oracle(pc1, pc2):
    """nn_distance.py:104-122 — squared-distance Chamfer."""
    d = ((pc1[:, :, None, :] - pc2[:, None, :, :]) ** 2).sum(-1)
    return d.min(2), d.argmin(2), d.min(1), d.argmin(1)


def aabb_iou_oracle(c1, s1, c2, s2):
    min1, max1 = c1 - s1 / 2, c1 + s1 / 2
    min2, max2 = c2 - s2 / 2, c2 + s2 / 2
    inter = np.prod(np.clip(np.minimum(max1, max2) - np.maximum(min1, min2), 0, None), -1)
    union = np.prod(s1, -1) + np.prod(s2, -1) - inter
    return inter / union
