"""Property/fuzz sweeps for the native-op layer.

The shape-specific parity tests (tests/test_ops.py) pin the canonical
configurations; this module sweeps seeded-random and adversarial inputs
— odd/prime sizes, duplicates, exact-boundary distances, empty balls,
degenerate clouds — against the same CUDA-transcription oracles
(tests/oracles.py), so an edge in the fixed-shape selection logic
(block padding, pad-with-first, tie-breaks) can't hide between the
canonical shapes. Deterministic seeds; runs on the CPU backend.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests import oracles
from vlp3d import ops
from vlp3d.ops.ball_query import ball_query_with_count
from vlp3d.ops.grouping import gather_points, group_points
from vlp3d.ops.interpolate import three_interpolate, three_nn


def _clouds(seed, b, n, dup=True, pad_origin=0):
    rng = np.random.default_rng(seed)
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    if dup and n >= 8:
        xyz[:, n // 2 : n // 2 + 4] = xyz[:, :4]  # exact duplicates: ties
    if pad_origin:
        xyz[:, -pad_origin:] = 0.0  # FPS validity-skip rule
    return xyz


class TestFPSFuzz:
    @pytest.mark.parametrize(
        "seed,b,n,npoint,pad",
        [
            (0, 1, 7, 7, 0),
            (1, 2, 33, 16, 0),
            (2, 3, 129, 64, 8),
            (3, 1, 257, 257, 16),
            (4, 2, 1000, 3, 100),
            (5, 4, 64, 1, 0),
        ],
    )
    def test_random_vs_oracle(self, seed, b, n, npoint, pad):
        xyz = _clouds(seed, b, n, pad_origin=pad)
        got = np.asarray(
            ops.furthest_point_sample(jnp.asarray(xyz), npoint, impl="xla")
        )
        np.testing.assert_array_equal(got, oracles.fps_oracle(xyz, npoint))

    def test_all_invalid_cloud(self):
        # every point fails the |p|^2 > 1e-3 validity rule
        # (sampling_gpu.cu:95-99): the oracle picks argmax of all -1.0
        xyz = np.zeros((2, 16, 3), np.float32)
        got = np.asarray(
            ops.furthest_point_sample(jnp.asarray(xyz), 4, impl="xla")
        )
        np.testing.assert_array_equal(got, oracles.fps_oracle(xyz, 4))

    def test_two_distinct_points(self):
        xyz = np.zeros((1, 6, 3), np.float32)
        xyz[0, 0] = [1, 0, 0]
        xyz[0, 3] = [-1, 0, 0]
        got = np.asarray(
            ops.furthest_point_sample(jnp.asarray(xyz), 3, impl="xla")
        )
        np.testing.assert_array_equal(got, oracles.fps_oracle(xyz, 3))


class TestBallQueryFuzz:
    @pytest.mark.parametrize(
        "seed,b,n,m,nsample,radius",
        [
            (10, 1, 31, 5, 4, 0.5),
            (11, 2, 127, 130, 16, 0.8),   # more centers than points
            (12, 3, 128, 64, 1, 0.3),
            (13, 1, 129, 7, 200, 2.0),    # nsample > n
            (14, 2, 1003, 256, 32, 1e-6), # empty balls -> zeros
            (15, 2, 511, 33, 64, 100.0),  # everything in ball
        ],
    )
    def test_random_vs_oracle(self, seed, b, n, m, nsample, radius):
        rng = np.random.default_rng(seed)
        xyz = _clouds(seed, b, n)
        new_xyz = rng.standard_normal((b, m, 3)).astype(np.float32)
        new_xyz[:, 0] = xyz[:, 0]  # a center ON a support point (d2 = 0)
        got = np.asarray(
            ops.ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz))
        )
        want = oracles.ball_query_oracle(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_exact_boundary_excluded(self):
        # d2 == r^2 must be OUTSIDE (strict <, ball_query_gpu.cu:33); axis-
        # aligned offsets of exactly r are representable so d2 is exact
        r = 0.5
        xyz = np.zeros((1, 8, 3), np.float32)
        xyz[0, 1] = [r, 0, 0]          # exactly ON the boundary
        xyz[0, 2] = [np.float32(r) * 0.999, 0, 0]
        xyz[0, 3] = [0, r, 0]
        xyz[0, 4] = [0, 0, 2 * r]
        new_xyz = np.zeros((1, 1, 3), np.float32)
        got = np.asarray(ops.ball_query(r, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        want = oracles.ball_query_oracle(r, 8, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)
        assert 1 not in got[0, 0], "boundary point must be excluded"

    def test_count_matches_oracle_membership(self):
        rng = np.random.default_rng(20)
        xyz = _clouds(21, 2, 257)
        new_xyz = rng.standard_normal((2, 19, 3)).astype(np.float32)
        _, cnt = ball_query_with_count(
            0.7, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)
        )
        d2 = ((new_xyz[:, :, None] - xyz[:, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(
            np.asarray(cnt), (d2 < 0.7 * 0.7).sum(-1).astype(np.int32)
        )


class TestGatherGroupFuzz:
    @pytest.mark.parametrize("seed,b,n,c,m", [(30, 2, 37, 5, 11), (31, 3, 300, 135, 513)])
    def test_gather_points(self, seed, b, n, c, m):
        rng = np.random.default_rng(seed)
        pts = rng.standard_normal((b, n, c)).astype(np.float32)
        idx = rng.integers(0, n, (b, m)).astype(np.int32)
        got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[i][idx[i]] for i in range(b)])
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize(
        "seed,b,n,c,m,k", [(32, 2, 61, 7, 13, 3), (33, 1, 40960, 131, 64, 8)]
    )
    def test_group_points(self, seed, b, n, c, m, k):
        rng = np.random.default_rng(seed)
        pts = rng.standard_normal((b, n, c)).astype(np.float32)
        idx = rng.integers(0, n, (b, m, k)).astype(np.int32)
        idx[:, 0, :] = 0  # heavy duplication: collides in the VJP scatter
        got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[i][idx[i]] for i in range(b)])
        np.testing.assert_array_equal(got, want)

    def test_group_points_vjp_duplicate_indices(self):
        """The sorted-scatter custom VJP must sum colliding cotangents
        exactly like the dense one-hot transpose."""
        import jax

        rng = np.random.default_rng(34)
        b, n, c, m, k = 2, 29, 4, 7, 5
        pts = jnp.asarray(rng.standard_normal((b, n, c)).astype(np.float32))
        idx = rng.integers(0, n, (b, m, k)).astype(np.int32)
        idx[:, :, 0] = 3  # every row collides on source row 3
        idx = jnp.asarray(idx)
        cot = jnp.asarray(rng.standard_normal((b, m, k, c)).astype(np.float32))

        _, vjp = jax.vjp(lambda p: group_points(p, idx), pts)
        got = np.asarray(vjp(cot)[0])
        want = np.zeros((b, n, c), np.float32)
        idx_np, cot_np = np.asarray(idx), np.asarray(cot)
        for bi in range(b):
            for mi in range(m):
                for ki in range(k):
                    want[bi, idx_np[bi, mi, ki]] += cot_np[bi, mi, ki]
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestInterpolateFuzz:
    @pytest.mark.parametrize("seed,b,n,m", [(40, 2, 33, 9), (41, 1, 257, 1000)])
    def test_three_nn(self, seed, b, n, m):
        rng = np.random.default_rng(seed)
        unknown = rng.standard_normal((b, n, 3)).astype(np.float32)
        known = rng.standard_normal((b, m, 3)).astype(np.float32)
        known[:, -2:] = known[:, :1]  # duplicated known points: ties
        d, i = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        dw, iw = oracles.three_nn_oracle(unknown, known)
        np.testing.assert_allclose(np.asarray(d), dw, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i), iw)

    def test_three_interpolate_exact(self):
        rng = np.random.default_rng(42)
        b, m, c, n = 2, 11, 6, 23
        feats = rng.standard_normal((b, m, c)).astype(np.float32)
        idx = rng.integers(0, m, (b, n, 3)).astype(np.int32)
        w = rng.random((b, n, 3)).astype(np.float32)
        got = np.asarray(
            three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
        )
        want = np.einsum(
            "bnkc,bnk->bnc",
            np.stack([feats[i][idx[i]] for i in range(b)]),
            w,
        )
        np.testing.assert_allclose(got, want, atol=1e-5)
