"""Default-tier remat coverage at tiny backbone-only shapes (the full
JointNet remat suite is `-m slow`, tests/test_remat.py — multi-minute on
the 1-core testbed).

Also pins the r05 perf-guard contract (VERDICT r04 item 2): the
POINT_INDS residual name tags exist ONLY under remat — a non-remat
program carries no checkpoint_name primitives, so the default compiled
program is byte-identical to pre-tag builds.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.models.backbone import PointNet2Backbone


def _backbones():
    kw = dict(
        input_feature_dim=1,
        npoints=(32, 16, 8, 8),
        radii=(0.2, 0.4, 0.8, 1.2),
        nsamples=(8, 8, 4, 4),
    )
    return (
        PointNet2Backbone(remat=False, **kw),
        PointNet2Backbone(remat=True, **kw),
    )


def _pc():
    return jax.random.normal(jax.random.key(0), (1, 128, 4), jnp.float32)


def test_remat_forward_and_grads_match_dense():
    dense, remat = _backbones()
    pc = _pc()
    variables = dense.init(jax.random.key(1), pc)

    out_d = jax.jit(lambda v, p: dense.apply(v, p))(variables, pc)
    out_r = jax.jit(lambda v, p: remat.apply(v, p))(variables, pc)
    np.testing.assert_allclose(
        np.asarray(out_d["fp2_features"]), np.asarray(out_r["fp2_features"]),
        rtol=0, atol=0,
    )

    def loss(mod):
        def f(params):
            out = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                pc,
            )
            return jnp.sum(out["fp2_features"] ** 2)

        return f

    g_d = jax.jit(jax.grad(loss(dense)))(variables["params"])
    g_r = jax.jit(jax.grad(loss(remat)))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        )


def test_point_inds_tags_only_under_remat():
    dense, remat = _backbones()
    pc = _pc()
    variables = dense.init(jax.random.key(1), pc)

    def grad_jaxpr(mod):
        def f(params):
            out = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                pc,
            )
            return jnp.sum(out["fp2_features"] ** 2)

        return str(jax.make_jaxpr(jax.grad(f))(variables["params"]))

    s_dense = grad_jaxpr(dense)
    s_remat = grad_jaxpr(remat)
    # remat: checkpoint segments present, index tensors tagged as the
    # save-policy residuals
    assert "remat" in s_remat or "checkpoint" in s_remat
    assert "point_inds" in s_remat
    # non-remat: NO name primitives, no checkpoint wrapping — the default
    # program is the plain dense graph (r04 shipped unconditional tags;
    # a bisect suspect for its 4% inference regression)
    assert "point_inds" not in s_dense
