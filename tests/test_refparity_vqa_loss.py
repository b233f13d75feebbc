"""DIRECT parity for the ScanQA loss stack: the reference get_loss
(lib/vqa/loss_helper.py:270-357 — VoteNet class-form box losses with the
0.3/0.6 objectness gray zone, best-IoU reference SoftmaxRankingLoss,
answer BCE) vs our compute_vqa_loss on a shared synthetic batch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.losses.vqa import compute_vqa_loss

B, K, K2, S, N = 3, 24, 10, 32, 160
NUM_CLASS = 18


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def dc(torch):
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"
    from data.scannet.model_util_scannet import ScannetDatasetConfig

    return ScannetDatasetConfig()


def test_vqa_get_loss(torch, dc):
    from lib.vqa.loss_helper import get_loss as ref_get_loss

    rng = np.random.default_rng(29)
    mean_size = dc.mean_size_arr.astype(np.float32)
    nh = dc.num_heading_bin

    d = {}
    d["seed_xyz"] = rng.normal(0, 1, (B, S, 3)).astype(np.float32)
    d["vote_xyz"] = rng.normal(0, 1, (B, S, 3)).astype(np.float32)
    d["seed_inds"] = rng.integers(0, N, (B, S)).astype(np.int64)
    d["vote_label"] = rng.normal(0, 0.3, (B, N, 9)).astype(np.float32)
    d["vote_label_mask"] = (rng.uniform(size=(B, N)) > 0.4).astype(np.int64)

    d["aggregated_vote_xyz"] = rng.normal(0, 1.0, (B, K, 3)).astype(
        np.float32)
    d["objectness_scores"] = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    d["center_label"] = rng.normal(0, 1.2, (B, K2, 3)).astype(np.float32)
    d["box_label_mask"] = (rng.uniform(size=(B, K2)) > 0.3).astype(
        np.float32)
    d["heading_class_label"] = np.zeros((B, K2), np.int64)
    d["heading_residual_label"] = np.zeros((B, K2), np.float32)
    d["size_class_label"] = rng.integers(0, NUM_CLASS, (B, K2))
    d["size_residual_label"] = rng.normal(0, 0.1, (B, K2, 3)).astype(
        np.float32)
    d["sem_cls_label"] = rng.integers(0, NUM_CLASS, (B, K2))

    d["center"] = rng.normal(0, 1.2, (B, K, 3)).astype(np.float32)
    d["heading_scores"] = rng.normal(0, 1, (B, K, nh)).astype(np.float32)
    d["heading_residuals_normalized"] = rng.normal(0, 0.2, (B, K, nh)).astype(
        np.float32)
    d["heading_residuals"] = (
        d["heading_residuals_normalized"] * (np.pi / nh))
    d["size_scores"] = rng.normal(0, 1, (B, K, NUM_CLASS)).astype(np.float32)
    d["size_residuals_normalized"] = rng.normal(
        0, 0.15, (B, K, NUM_CLASS, 3)).astype(np.float32)
    d["size_residuals"] = (
        d["size_residuals_normalized"] * mean_size[None, None]).astype(
        np.float32)
    d["sem_cls_scores"] = rng.normal(0, 1, (B, K, NUM_CLASS)).astype(
        np.float32)

    d["cluster_ref"] = rng.normal(0, 1, (B, K)).astype(np.float32)
    d["ref_center_label"] = rng.normal(0, 1.2, (B, 3)).astype(np.float32)
    d["ref_heading_class_label"] = np.zeros((B,), np.int64)
    d["ref_heading_residual_label"] = np.zeros((B,), np.float32)
    d["ref_size_class_label"] = rng.integers(0, NUM_CLASS, (B,))
    d["ref_size_residual_label"] = rng.normal(0, 0.1, (B, 3)).astype(
        np.float32)
    # plant the referred box on a proposal so argmax-IoU labels are
    # well-defined (not an all-zero-IoU tie)
    for i in range(B):
        p = 3 * i + 2
        d["ref_center_label"][i] = d["center"][i, p] + 0.02
        cls = int(np.argmax(d["size_scores"][i, p]))
        pred_size = mean_size[cls] + d["size_residuals"][i, p, cls]
        d["ref_size_class_label"][i] = cls
        d["ref_size_residual_label"][i] = (
            np.abs(pred_size) * 1.05 - mean_size[cls])

    d["lang_scores"] = rng.normal(0, 1, (B, NUM_CLASS)).astype(np.float32)
    d["object_cat"] = rng.integers(0, NUM_CLASS, (B,))
    n_ans = 9
    d["answer_scores"] = rng.normal(0, 1, (B, n_ans)).astype(np.float32)
    d["answer_cat_scores"] = rng.uniform(0, 1, (B, n_ans)).astype(np.float32)

    td = {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}
    _, td = ref_get_loss(td, dc, detection=True, use_reference=True,
                         use_lang_classifier=True, use_answer=True)

    # our VQA head decodes pred_center/pred_size in class form
    # (ap_helper_vqa semantics); feed the same decode the reference's
    # compute_reference_loss performs internally (loss_helper.py:210-236)
    size_cls = np.argmax(d["size_scores"], -1)
    size_res = np.take_along_axis(
        d["size_residuals"], size_cls[..., None, None].repeat(3, -1),
        axis=2)[:, :, 0]
    pred_size = mean_size[size_cls] + size_res
    outputs = {k: jnp.asarray(d[k]) for k in (
        "seed_xyz", "vote_xyz", "aggregated_vote_xyz", "objectness_scores",
        "center", "heading_scores", "heading_residuals_normalized",
        "size_scores", "size_residuals_normalized", "sem_cls_scores",
        "cluster_ref", "lang_scores", "answer_scores")}
    outputs["seed_inds"] = jnp.asarray(d["seed_inds"].astype(np.int32))
    outputs["pred_center"] = jnp.asarray(d["center"])
    outputs["pred_size"] = jnp.asarray(pred_size)
    batch = {k: jnp.asarray(d[k]) for k in (
        "vote_label", "center_label", "box_label_mask",
        "heading_class_label", "heading_residual_label",
        "size_class_label", "size_residual_label", "sem_cls_label",
        "ref_center_label", "ref_size_class_label",
        "ref_size_residual_label", "object_cat", "answer_cat_scores")}
    batch["vote_label_mask"] = jnp.asarray(
        d["vote_label_mask"].astype(np.float32))

    total, m = compute_vqa_loss(
        outputs, batch, mean_size, num_heading_bin=nh,
        use_reference=True, use_lang_classifier=True, use_answer=True)

    for key, tol in (
        ("vote_loss", 1e-5), ("objectness_loss", 1e-5),
        ("center_loss", 1e-5), ("heading_cls_loss", 1e-5),
        ("heading_reg_loss", 1e-5), ("size_cls_loss", 1e-5),
        ("size_reg_loss", 1e-5), ("sem_cls_loss", 1e-5),
        ("box_loss", 5e-5), ("ref_loss", 1e-5), ("lang_loss", 1e-5),
        ("answer_loss", 1e-5),
    ):
        assert abs(float(m[key]) - float(td[key])) < tol, key
    np.testing.assert_array_equal(
        np.asarray(m["objectness_label"]), td["objectness_label"].numpy())
    np.testing.assert_array_equal(
        np.asarray(m["objectness_mask"]), td["objectness_mask"].numpy())
    np.testing.assert_array_equal(
        np.asarray(m["cluster_labels"]), td["cluster_labels"].numpy())
    assert abs(float(total) - float(td["loss"])) < 5e-4
