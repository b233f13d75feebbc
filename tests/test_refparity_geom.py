"""DIRECT parity vs the reference's own code (imported, not transcribed).

Each test runs the actual PyTorch reference function from /root/reference
on CPU and asserts our JAX implementation matches. See tests/refshim.py.
Covers the pure-function geometry/loss primitives:

  * utils/box_util.py: get_3d_box_batch, roty/rotz_batch_pytorch,
    box3d_diou_batch_tensor, box3d_iou_batch_tensor
  * utils/nn_distance.py: huber_loss, nn_distance (sq / l1 / l1smooth)
  * lib/loss_helper/loss.py: all four ranking losses
  * lib/loss_helper/loss_answering.py: both branches
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.geometry import boxes as jboxes
from vlp3d.geometry.nn_distance import huber_loss as j_huber
from vlp3d.geometry.nn_distance import nn_distance as j_nn_distance
from vlp3d.losses.answering import compute_answer_classification_loss
from vlp3d.losses.grounding import (
    sigmoid_ranking_focal_loss,
    sigmoid_ranking_loss,
    softmax_ranking_focal_loss,
    softmax_ranking_loss,
)


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def test_get_3d_box_batch(torch, rng):
    from utils.box_util import get_3d_box_batch

    size = rng.uniform(0.1, 3.0, (4, 6, 3)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, (4, 6)).astype(np.float32)
    center = rng.normal(0, 2, (4, 6, 3)).astype(np.float32)

    ref = get_3d_box_batch(size, heading, center)
    ours = jboxes.get_3d_box_batch(size, heading, center)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_rot_batches(torch, rng):
    from utils.box_util import rotz_batch_pytorch, roty_batch_pytorch

    t = rng.uniform(-np.pi, np.pi, (3, 5)).astype(np.float32)
    tt = torch.from_numpy(t)
    np.testing.assert_allclose(
        np.asarray(jboxes.rotz_batch(jnp.asarray(t))),
        rotz_batch_pytorch(tt).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jboxes.roty_batch(jnp.asarray(t))),
        roty_batch_pytorch(tt).numpy(), atol=1e-6)


def test_box3d_diou_batch_tensor(torch, rng):
    from utils.box_util import box3d_diou_batch_tensor

    n = 256
    c1 = rng.normal(0, 2, (n, 3)).astype(np.float32)
    s1 = rng.uniform(0.1, 3.0, (n, 3)).astype(np.float32)
    c2 = c1 + rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    s2 = rng.uniform(0.1, 3.0, (n, 3)).astype(np.float32)

    riou, rdiou = box3d_diou_batch_tensor(
        torch.from_numpy(c1), torch.from_numpy(s1),
        torch.from_numpy(c2), torch.from_numpy(s2))
    jiou, jdiou = jboxes.box3d_diou(c1, s1, c2, s2)
    np.testing.assert_allclose(np.asarray(jiou), riou.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jdiou), rdiou.numpy(), atol=1e-5)


def test_box3d_iou_corners(torch, rng):
    from utils.box_util import box3d_iou_batch_tensor, get_3d_box_batch

    n = 64
    # heading == 0 (the ScanNet regime where the corner IoU is exact)
    mk = lambda: get_3d_box_batch(
        rng.uniform(0.2, 2.0, (n, 3)).astype(np.float32),
        np.zeros(n, np.float32),
        rng.normal(0, 1, (n, 3)).astype(np.float32))
    corners1, corners2 = mk(), mk()
    ref = box3d_iou_batch_tensor(
        torch.from_numpy(corners1.astype(np.float32)),
        torch.from_numpy(corners2.astype(np.float32)))
    ours = jboxes.box3d_iou_corners(jnp.asarray(corners1),
                                    jnp.asarray(corners2))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_huber_and_nn_distance(torch, rng):
    from utils.nn_distance import huber_loss, nn_distance

    err = rng.normal(0, 2, (7, 11)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(j_huber(jnp.asarray(err), delta=0.6)),
        huber_loss(torch.from_numpy(err), delta=0.6).numpy(), atol=1e-6)

    pc1 = rng.normal(0, 1, (2, 33, 3)).astype(np.float32)
    pc2 = rng.normal(0, 1, (2, 17, 3)).astype(np.float32)
    for kw in ({}, {"l1": True}, {"l1smooth": True, "delta": 0.4}):
        rd1, ri1, rd2, ri2 = nn_distance(
            torch.from_numpy(pc1), torch.from_numpy(pc2), **kw)
        jd1, ji1, jd2, ji2 = j_nn_distance(
            jnp.asarray(pc1), jnp.asarray(pc2), **kw)
        np.testing.assert_allclose(np.asarray(jd1), rd1.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jd2), rd2.numpy(), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ji1), ri1.numpy())
        np.testing.assert_array_equal(np.asarray(ji2), ri2.numpy())


def _one_hot_targets(rng, shape):
    t = np.zeros(shape, np.float32)
    idx = rng.integers(0, shape[-1], shape[:-1])
    np.put_along_axis(t, idx[..., None], 1.0, axis=-1)
    return t


def test_ranking_losses(torch, rng):
    from lib.loss_helper.loss import (SigmoidRankingFocalLoss,
                                      SigmoidRankingLoss,
                                      SoftmaxRankingFocalLoss,
                                      SoftmaxRankingLoss)

    x = rng.normal(0, 2, (13, 32)).astype(np.float32)
    t_soft = _one_hot_targets(rng, x.shape)
    mask = (rng.uniform(size=13) > 0.3).astype(np.float32)
    xt, tt = torch.from_numpy(x), torch.from_numpy(t_soft)
    maskt = torch.from_numpy(mask)

    ref = SoftmaxRankingLoss()(xt, tt).item()
    ours = softmax_ranking_loss(
        jnp.asarray(x), jnp.asarray(t_soft), jnp.ones(13))
    assert abs(float(ours) - ref) < 1e-5

    ref = SoftmaxRankingFocalLoss(gamma=2)(xt, tt, maskt).item()
    ours = softmax_ranking_focal_loss(
        jnp.asarray(x), jnp.asarray(t_soft), mask=jnp.asarray(mask))
    assert abs(float(ours) - ref) < 1e-5

    t_bin = (rng.uniform(size=x.shape) > 0.5).astype(np.float32)
    tb = torch.from_numpy(t_bin)
    ref = SigmoidRankingLoss()(xt, tb).item()
    ours = sigmoid_ranking_loss(jnp.asarray(x), jnp.asarray(t_bin))
    assert abs(float(ours) - ref) < 1e-5

    mask2 = (rng.uniform(size=x.shape) > 0.3).astype(np.float32)
    ref = SigmoidRankingFocalLoss(gamma=2)(
        xt, tb, torch.from_numpy(mask2)).item()
    ours = sigmoid_ranking_focal_loss(
        jnp.asarray(x), jnp.asarray(t_bin), mask=jnp.asarray(mask2))
    assert abs(float(ours) - ref) < 1e-5


def test_answer_classification_loss(torch, rng):
    from lib.loss_helper.loss_answering import (
        compute_answer_classification_loss as ref_loss)

    scores = rng.normal(0, 2, (6, 40)).astype(np.float32)
    soft = rng.uniform(0, 1, (6, 40)).astype(np.float32)
    cat = rng.integers(0, 40, 6)

    ref = ref_loss({"answer_scores": torch.from_numpy(scores),
                    "answer_cat_scores": torch.from_numpy(soft)}).item()
    ours = compute_answer_classification_loss(
        jnp.asarray(scores), answer_cat_scores=jnp.asarray(soft))
    assert abs(float(ours) - ref) < 1e-4

    ref = ref_loss({"answer_scores": torch.from_numpy(scores),
                    "answer_cat": torch.from_numpy(cat)}).item()
    ours = compute_answer_classification_loss(
        jnp.asarray(scores), answer_cat=jnp.asarray(cat))
    assert abs(float(ours) - ref) < 1e-5
