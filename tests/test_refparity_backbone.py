"""DIRECT parity for the PointNet++ backbone: the reference
Pointnet2Backbone (models/base_module/backbone_module.py) running on CPU
via the pointnet2._ext stub (tests/refshim.py — kernel-exact torch
implementations of the CUDA ops) vs our flax PointNet2Backbone under
imported weights.

This pins the whole geometric front end end-to-end: FPS index trails,
ball-query neighbourhoods, the fused first-layer SA math (linear-then-
gather == the reference's gather-then-conv), BN eval statistics, max
pooling, and the FP modules' inverse-DISTANCE (not squared) 3-NN
interpolation — the drift this test caught (three_nn's wrapper sqrt at
pointnet2_utils.py:139).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refimport import import_point_mlp, import_sa, randomize_bn_stats
from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.backbone import PointNet2Backbone

B, N = 2, 4096


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def _import_backbone(sd):
    params, stats = {}, {}
    for sa in ("sa1", "sa2", "sa3", "sa4"):
        params[sa], stats[sa] = import_sa(sd, sa)
    for fp in ("fp1", "fp2"):
        pm, sm = import_point_mlp(sd, f"{fp}.mlp", range(2))
        params[fp] = {"PointMLP_0": pm}
        stats[fp] = {"PointMLP_0": sm}
    return params, stats


def test_backbone_forward(torch, rng):
    from models.base_module.backbone_module import (
        Pointnet2Backbone as RefBackbone)

    torch.manual_seed(5)
    ref = RefBackbone(input_feature_dim=1).eval()
    randomize_bn_stats(torch, ref)

    pc = rng.normal(0, 1.5, (B, N, 4)).astype(np.float32)
    with torch.no_grad():
        td = ref({"point_clouds": torch.from_numpy(pc)})

    params, stats = _import_backbone(ref.state_dict())
    out = PointNet2Backbone(input_feature_dim=1).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(pc),
        train=False)

    # exact index trails (FPS + fp2_inds slice)
    np.testing.assert_array_equal(np.asarray(out["sa1_inds"]),
                                  td["sa1_inds"].numpy())
    np.testing.assert_array_equal(np.asarray(out["sa2_inds"]),
                                  td["sa2_inds"].numpy())
    np.testing.assert_array_equal(np.asarray(out["fp2_inds"]),
                                  td["fp2_inds"].numpy())
    for k in ("sa1_xyz", "sa2_xyz", "sa3_xyz", "sa4_xyz", "fp2_xyz"):
        np.testing.assert_allclose(np.asarray(out[k]), td[k].numpy(),
                                   atol=1e-6)
    for k in ("sa1_features", "sa2_features", "sa3_features",
              "sa4_features", "fp2_features"):
        ref_f = td[k].numpy().transpose(0, 2, 1)  # (B,C,N) -> (B,N,C)
        np.testing.assert_allclose(np.asarray(out[k]), ref_f,
                                   rtol=5e-4, atol=5e-4, err_msg=k)
