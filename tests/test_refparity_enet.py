"""DIRECT parity for the ENet multiview encoder: the reference's
torch7-converted graph (lib/visual_grounding/enet.py:130-717, the
network that produced enet_feats_maxpool.hdf5 via
scripts/multiview_compute/compute_multiview_features.py:88-99) vs our
flax ENetEncoder under imported weights.

Pins: the concat initial block, per-channel PReLUs, the rescale-
cancelling Dropout2d (eval-time (1-p) scaling), downsample maxpool +
end-padded channel shortcut, exact conv bias layout, the asym
(1,5)->(5,1) conv pair, the dilation plan, BN eval statistics, and the
create_enet_for_3d module split (model[0..n-2] feature extractor +
model[n-1] 1x1 classifier, enet.py:697-706).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refimport import randomize_bn_stats
from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.enet import ENetEncoder, convert_enet_state_dict


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def ref_model(torch):
    from lib.visual_grounding.enet import create_enet

    torch.manual_seed(11)
    model = create_enet(41).eval()
    # non-trivial weights everywhere: randomize BN stats and PReLU slopes
    randomize_bn_stats(torch, model)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.PReLU):
                m.weight.uniform_(0.05, 0.45)
    return model


def _feature_extractor(torch, model):
    """fixed+trainable split of create_enet_for_3d (enet.py:700-706)
    without the checkpoint load: all modules but the classifier."""
    n = len(model)
    return torch.nn.Sequential(*(model[i] for i in range(n - 1))).eval()


def test_feature_map_parity(torch, ref_model, rng):
    extractor = _feature_extractor(torch, ref_model)
    img = rng.uniform(0, 1, (2, 64, 80, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = extractor(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    variables = convert_enet_state_dict(ref_model.state_dict())
    out = ENetEncoder().apply(variables, jnp.asarray(img), train=False)

    assert out.shape == (2, 8, 10, 128) == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=2e-4, atol=2e-4)


def test_classifier_logits_parity(torch, ref_model, rng):
    """Full graph incl. the 1x1 classifier conv (model[n-1])."""
    img = rng.uniform(0, 1, (1, 48, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    variables = convert_enet_state_dict(ref_model.state_dict(),
                                        num_classes=41)
    out = ENetEncoder(num_classes=41).apply(
        variables, jnp.asarray(img), train=False)
    assert out.shape == (1, 6, 6, 41) == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=2e-4, atol=2e-4)


def test_non_multiple_of_8_input(torch, ref_model, rng):
    """Even but non-multiple-of-8 sizes exercise the floor-mode pooling
    edges. (Odd sizes crash the reference itself: its initial-block
    concat needs conv-ceil == pool-floor, enet.py:131-137.)"""
    img = rng.uniform(0, 1, (1, 68, 52, 3)).astype(np.float32)
    extractor = _feature_extractor(torch, ref_model)
    with torch.no_grad():
        ref_out = extractor(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy().transpose(0, 2, 3, 1)

    variables = convert_enet_state_dict(ref_model.state_dict())
    out = ENetEncoder().apply(variables, jnp.asarray(img), train=False)
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(np.asarray(out), ref_out,
                               rtol=2e-4, atol=2e-4)
