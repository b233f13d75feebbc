"""Golden-value tests: TPU-native ops vs numpy oracles of the reference CUDA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp3d import ops
from vlp3d.geometry import nn_distance, box3d_diou, get_3d_box_batch
from tests import oracles


def make_cloud(rng, b=2, n=512, pad=16):
    """Random cloud with some near-origin padding points (FPS must skip them)."""
    xyz = rng.uniform(-2.0, 2.0, size=(b, n, 3)).astype(np.float32)
    xyz[:, -pad:, :] = 0.0  # padding at origin
    return xyz


class TestFPS:
    def test_matches_oracle(self, rng):
        xyz = make_cloud(rng)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 64, impl="xla"))
        want = oracles.fps_oracle(xyz, 64)
        np.testing.assert_array_equal(got, want)

    def test_starts_at_zero_and_skips_origin(self, rng):
        xyz = make_cloud(rng, b=1, n=128, pad=32)
        idx = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 32, impl="xla"))
        assert idx[0, 0] == 0
        assert (idx < 96).all()  # origin-padded points never chosen

    def test_pallas_interpret_matches(self, rng):
        # Pallas kernel vs oracle under interpret mode (no TPU needed).
        from jax.experimental.pallas import tpu as pltpu

        xyz = make_cloud(rng, b=2, n=256, pad=8)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                ops.furthest_point_sample(jnp.asarray(xyz), 32, impl="pallas")
            )
        want = oracles.fps_oracle(xyz, 32)
        np.testing.assert_array_equal(got, want)


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.3, 8), (0.8, 16), (0.05, 4)])
    def test_matches_oracle(self, rng, radius, nsample):
        xyz = rng.uniform(-1, 1, size=(2, 300, 3)).astype(np.float32)
        new_xyz = xyz[:, :40]
        got = np.asarray(
            ops.ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz))
        )
        want = oracles.ball_query_oracle(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_chunked_path(self, rng):
        xyz = rng.uniform(-1, 1, size=(2, 200, 3)).astype(np.float32)
        new_xyz = rng.uniform(-1, 1, size=(2, 70, 3)).astype(np.float32)
        got = np.asarray(
            ops.ball_query(0.4, 8, jnp.asarray(xyz), jnp.asarray(new_xyz), chunk=32)
        )
        want = oracles.ball_query_oracle(0.4, 8, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball_is_zeros(self):
        xyz = np.ones((1, 10, 3), np.float32) * 5.0
        new_xyz = np.zeros((1, 3, 3), np.float32)
        got = np.asarray(ops.ball_query(0.1, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        np.testing.assert_array_equal(got, 0)


class TestGrouping:
    def test_gather(self, rng):
        pts = rng.normal(size=(2, 50, 7)).astype(np.float32)
        idx = rng.integers(0, 50, size=(2, 12)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group(self, rng):
        pts = rng.normal(size=(2, 50, 7)).astype(np.float32)
        idx = rng.integers(0, 50, size=(2, 12, 5)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group_grad_is_scatter_add(self, rng):
        pts = jnp.asarray(rng.normal(size=(1, 20, 4)).astype(np.float32))
        idx = jnp.asarray(np.array([[[0, 0, 1], [2, 0, 2]]], np.int32))

        def f(p):
            return jnp.sum(ops.group_points(p, idx))

        g = np.asarray(jax.grad(f)(pts))
        want = np.zeros((1, 20, 4), np.float32)
        for j in idx[0].reshape(-1):
            want[0, int(j)] += 1.0
        np.testing.assert_allclose(g, want)

    def test_group_vjp_matches_native_autodiff(self, rng):
        """The sorted-scatter custom VJP vs XLA's own gather backward on
        realistic shapes with a RANDOM cotangent: a uniform cotangent
        (the sum-based test above) cannot catch value-routing errors in
        the argsort/segment-sum rewrite — duplicate indices with distinct
        cotangent values can."""
        pts = jnp.asarray(rng.normal(size=(2, 300, 7)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, 300, size=(2, 64, 16)).astype(np.int32)
        )
        ct = jnp.asarray(rng.normal(size=(2, 64, 16, 7)).astype(np.float32))

        _, vjp = jax.vjp(lambda p: ops.group_points(p, idx), pts)
        got = np.asarray(vjp(ct)[0])

        def native(p):
            return jax.vmap(lambda pb, ib: pb[ib])(p, idx)

        _, nvjp = jax.vjp(native, pts)
        want = np.asarray(nvjp(ct)[0])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)

    def test_gather_vjp_matches_native_autodiff(self, rng):
        """gather_points' custom VJP (sampling_gpu.cu:39-52 semantics)
        had forward-only coverage; pin its backward the same way."""
        pts = jnp.asarray(rng.normal(size=(2, 200, 6)).astype(np.float32))
        idx = jnp.asarray(
            rng.integers(0, 200, size=(2, 80)).astype(np.int32)
        )
        ct = jnp.asarray(rng.normal(size=(2, 80, 6)).astype(np.float32))

        _, vjp = jax.vjp(lambda p: ops.gather_points(p, idx), pts)
        got = np.asarray(vjp(ct)[0])

        def native(p):
            return jnp.take_along_axis(p, idx[:, :, None], axis=1)

        _, nvjp = jax.vjp(native, pts)
        want = np.asarray(nvjp(ct)[0])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


class TestThreeNN:
    def test_matches_oracle(self, rng):
        unknown = rng.normal(size=(2, 60, 3)).astype(np.float32)
        known = rng.normal(size=(2, 25, 3)).astype(np.float32)
        d, i = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        dw, iw = oracles.three_nn_oracle(unknown, known)
        np.testing.assert_array_equal(np.asarray(i), iw)
        np.testing.assert_allclose(np.asarray(d), dw, rtol=1e-5, atol=1e-5)

    def test_interpolate(self, rng):
        feats = rng.normal(size=(1, 10, 6)).astype(np.float32)
        idx = np.array([[[0, 1, 2], [3, 4, 5]]], np.int32)
        w = np.array([[[0.5, 0.3, 0.2], [1.0, 0.0, 0.0]]], np.float32)
        got = np.asarray(
            ops.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
        )
        want = np.einsum("nkc,nk->nc", feats[0][idx[0]], w[0])[None]
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestGeometry:
    def test_nn_distance(self, rng):
        pc1 = rng.normal(size=(2, 30, 3)).astype(np.float32)
        pc2 = rng.normal(size=(2, 20, 3)).astype(np.float32)
        d1, i1, d2, i2 = nn_distance(jnp.asarray(pc1), jnp.asarray(pc2))
        dw1, iw1, dw2, iw2 = oracles.nn_distance_oracle(pc1, pc2)
        np.testing.assert_allclose(np.asarray(d1), dw1, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), iw1)
        np.testing.assert_allclose(np.asarray(d2), dw2, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(i2), iw2)

    def test_iou_identity_and_disjoint(self):
        c = jnp.zeros((2, 3))
        s = jnp.ones((2, 3))
        iou, diou = box3d_diou(c, s, c, s)
        np.testing.assert_allclose(np.asarray(iou), 1.0, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(diou), 1.0, rtol=1e-6)
        c2 = jnp.ones((2, 3)) * 10
        iou2, diou2 = box3d_diou(c, s, c2, s)
        np.testing.assert_allclose(np.asarray(iou2), 0.0)
        assert (np.asarray(diou2) <= 0).all()

    def test_iou_half_overlap(self):
        # unit cubes offset by 0.5 in x: inter=0.5, union=1.5
        c1 = jnp.array([[0.0, 0, 0]])
        c2 = jnp.array([[0.5, 0, 0]])
        s = jnp.ones((1, 3))
        iou, _ = box3d_diou(c1, s, c2, s)
        np.testing.assert_allclose(np.asarray(iou), 1 / 3, rtol=1e-6)

    def test_corners_zero_heading(self, rng):
        size = rng.uniform(0.5, 2, size=(4, 3)).astype(np.float32)
        center = rng.normal(size=(4, 3)).astype(np.float32)
        corners = np.asarray(
            get_3d_box_batch(jnp.asarray(size), jnp.zeros(4), jnp.asarray(center))
        )
        np.testing.assert_allclose(corners.min(1), center - size / 2, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(corners.max(1), center + size / 2, rtol=1e-5, atol=1e-6)
