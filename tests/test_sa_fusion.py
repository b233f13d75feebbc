"""Fused-first-layer SA module == naive grouped path (exact math)."""

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.models.layers import SAModule


def test_fused_equals_naive(rng):
    xyz = jnp.asarray(rng.uniform(0, 3, (2, 200, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 200, 16)).astype(np.float32))

    fused = SAModule(32, 0.5, 8, [24, 32], fuse_first_layer=True)
    naive = SAModule(32, 0.5, 8, [24, 32], fuse_first_layer=False)
    vf = fused.init({"params": jax.random.key(0)}, xyz, feats)
    vn = naive.init({"params": jax.random.key(0)}, xyz, feats)

    # map fused params onto the naive parameter layout: naive first Dense
    # kernel (3+16, 24) = [W_xyz; W_feat]
    pf = vf["params"]
    pn = jax.tree_util.tree_map(lambda x: x, vn["params"])
    w_xyz = pf["first_xyz"]["kernel"]
    w_feat = pf["first_feat"]["kernel"]
    pn["PointMLP_0"]["Dense_0"]["kernel"] = jnp.concatenate(
        [w_xyz, w_feat], axis=0
    )
    # copy BN + later layers
    pn["PointMLP_0"]["BatchNorm_0"] = pf["BatchNorm_0"]
    pn["PointMLP_0"]["Dense_1"] = pf["PointMLP_0"]["Dense_0"]
    pn["PointMLP_0"]["BatchNorm_1"] = pf["PointMLP_0"]["BatchNorm_0"]

    sf = vf.get("batch_stats", {})
    # naive batch_stats layout
    sn = {
        "PointMLP_0": {
            "BatchNorm_0": sf["BatchNorm_0"],
            "BatchNorm_1": sf["PointMLP_0"]["BatchNorm_0"],
        }
    }

    of = fused.apply(
        {"params": pf, "batch_stats": sf}, xyz, feats
    )
    on = naive.apply(
        {"params": pn, "batch_stats": sn}, xyz, feats
    )
    np.testing.assert_array_equal(np.asarray(of[2]), np.asarray(on[2]))
    np.testing.assert_allclose(
        np.asarray(of[1]), np.asarray(on[1]), rtol=1e-4, atol=1e-5
    )
