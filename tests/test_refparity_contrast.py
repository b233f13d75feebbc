"""DIRECT parity for the OCC/OSC contrastive module: the reference
ContrastModule (models/constrast_module/constrast_module.py — per-scene /
per-sentence Python loops, dynamic positive-proposal selection, pytorch3d
box3d_overlap) vs our fixed-shape masked rewrite (vlp3d/models/contrast.py)
under imported weights.

The pytorch3d box3d_overlap is stubbed with an exact axis-aligned
implementation (refshim) — valid because create_box_batch never rotates
(ScanNet headings are identically 0, model_util_scannet.py:133-143).
Pins: the IoU>0.25 target masks (incl. the +1e-2 GT size epsilon), the
SoftCrossEntropy mean semantics over the dynamically-sized
(1, obj_cnt) / (obj_cnt, obj_cnt) matrices, the vanishing transposed OCC
term, per-sentence accumulation, and the /batch_size normalization.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.contrast import ContrastModule

B, K, L, H = 2, 32, 4, 128


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def test_contrast_losses(torch, rng):
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"
    from data.scannet.model_util_scannet import ScannetDatasetConfig
    from models.constrast_module.constrast_module import (
        ContrastModule as RefContrast)

    dc = ScannetDatasetConfig()
    torch.manual_seed(3)
    ref = RefContrast(dc, hidden=H).eval()

    pred_center = rng.normal(0, 1.5, (B, K, 3)).astype(np.float32)
    pred_size = rng.uniform(0.4, 2.0, (B, K, 3)).astype(np.float32)
    bbox_feature = rng.normal(0, 1, (B, K, H)).astype(np.float32)
    lang_emb = rng.normal(0, 1, (B * L, H)).astype(np.float32)
    objectness_scores = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    lang_num = np.array([L, L - 2], np.int64)

    # GT labels built so each sentence's box sits near a random proposal
    # (several IoU>0.25 positives, plus plenty of negatives)
    size_cls = rng.integers(0, 18, (B, L))
    tgt = rng.integers(0, K, (B, L))
    gt_center = (pred_center[np.arange(B)[:, None], tgt]
                 + rng.normal(0, 0.05, (B, L, 3))).astype(np.float32)
    gt_size = (pred_size[np.arange(B)[:, None], tgt]
               * rng.uniform(0.8, 1.2, (B, L, 3))).astype(np.float32)
    size_residual = gt_size - dc.mean_size_arr[size_cls].astype(np.float32)

    data_dict = {
        "epoch": 60,
        "pred_center": torch.from_numpy(pred_center),
        "pred_size": torch.from_numpy(pred_size),
        "bbox_feature": torch.from_numpy(bbox_feature),
        "aggregated_vote_features": torch.from_numpy(bbox_feature),
        "ref_center_label_list": torch.from_numpy(gt_center),
        "ref_heading_class_label_list": torch.from_numpy(
            np.zeros((B, L), np.int64)),
        "ref_heading_residual_label_list": torch.from_numpy(
            np.zeros((B, L), np.float32)),
        "ref_size_class_label_list": torch.from_numpy(size_cls),
        "ref_size_residual_label_list": torch.from_numpy(size_residual),
        "lang_num": torch.from_numpy(lang_num),
        "lang_emb": torch.from_numpy(lang_emb),
        "objectness_scores": torch.from_numpy(objectness_scores),
    }
    with torch.no_grad():
        td = ref(data_dict)

    sd = ref.state_dict()
    params = {
        "pc_proj": {"kernel": jnp.asarray(sd["pc_proj.weight"].numpy().T)},
        "text_proj": {
            "kernel": jnp.asarray(sd["text_proj.weight"].numpy().T)},
        "pc_proj_iou": {
            "kernel": jnp.asarray(sd["pc_proj_iou.0.weight"].numpy().T)},
        "tau": jnp.asarray(sd["nce_loss.tau"].numpy()),
    }
    # gt sizes exactly as the reference's param2obb_batch_tensor computes
    # them (float64 mean-size table + residual)
    gt_size_ref = (dc.mean_size_arr[size_cls]
                   + size_residual).astype(np.float32)
    out = ContrastModule(hidden=H).apply(
        {"params": params},
        jnp.asarray(bbox_feature),
        jnp.asarray(lang_emb),
        jnp.asarray(pred_center),
        jnp.asarray(pred_size),
        jnp.asarray(gt_center),
        jnp.asarray(gt_size_ref),
        jnp.argmax(jnp.asarray(objectness_scores), axis=-1).astype(
            jnp.float32),
        jnp.asarray(lang_num),
        jnp.asarray(60),
    )

    assert float(td["lang_con_loss"]) > 0 and float(td["iou_con_loss"]) > 0
    np.testing.assert_allclose(
        float(out["lang_con_loss"]), float(td["lang_con_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(out["iou_con_loss"]), float(td["iou_con_loss"]), rtol=1e-4)

    # epoch gate (constrast_module.py:54-56)
    gated = ContrastModule(hidden=H).apply(
        {"params": params},
        jnp.asarray(bbox_feature), jnp.asarray(lang_emb),
        jnp.asarray(pred_center), jnp.asarray(pred_size),
        jnp.asarray(gt_center), jnp.asarray(gt_size_ref),
        jnp.argmax(jnp.asarray(objectness_scores), axis=-1).astype(
            jnp.float32),
        jnp.asarray(lang_num), jnp.asarray(10))
    assert float(gated["lang_con_loss"]) == 0.0
    assert float(gated["iou_con_loss"]) == 0.0
