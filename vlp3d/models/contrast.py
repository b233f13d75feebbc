"""Object-level contrastive module: OCC (object<->text) + OSC (object<->object).

Vectorized port of `models/constrast_module/constrast_module.py:40-131`.
The reference loops over batch x sentence, selects positive-objectness
proposals dynamically, and calls pytorch3d box3d_overlap; here everything
is fixed-shape masked math:

  * the exact oriented-box IoU is replaced by AABB IoU — valid because
    ScanNet headings are identically 0 (model_util_scannet.py:133-143), so
    boxes are axis-aligned (see SURVEY §2.1); the GT box gets the
    reference's +1e-2 size epsilon;
  * dynamic positive-proposal selection becomes an objectness mask on the
    similarity logits (masked log-softmax) with count-normalized means,
    reproducing SoftCrossEntropy's mean over the (1, obj_cnt) /
    (obj_cnt, obj_cnt) matrices (constrast_module.py:18-37);
  * for OCC the transposed SoftCrossEntropy term vanishes in the reference
    (log_softmax over a singleton axis is 0), so only the v-side term /2
    survives — reproduced;
  * active from epoch >= 50 (constrast_module.py:54-56) via a where-gate.

Losses normalize by batch size only, matching :127-128.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.geometry.boxes import box3d_iou_aabb

_NEG = -1e9


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=axis, keepdims=True), eps
    )


class ContrastModule(nn.Module):
    hidden: int = 128
    iou_threshold: float = 0.25

    @nn.compact
    def __call__(
        self,
        bbox_feature: jax.Array,  # (B, K, H) relation output
        lang_emb: jax.Array,  # (B*L, H) CLS embeddings
        pred_center: jax.Array,  # (B, K, 3)
        pred_size: jax.Array,  # (B, K, 3)
        gt_center: jax.Array,  # (B, L, 3) per-sentence ref boxes
        gt_size: jax.Array,  # (B, L, 3)
        objectness_masks: jax.Array,  # (B, K) f32
        lang_num: jax.Array,  # (B,)
        epoch: jax.Array,  # scalar
    ):
        b, k, h = bbox_feature.shape
        l = gt_center.shape[1]
        lang_emb = lang_emb.reshape(b, l, h)

        pc_proj = nn.Dense(h, use_bias=False, name="pc_proj")
        text_proj = nn.Dense(h, use_bias=False, name="text_proj")
        pc_proj_iou = nn.Dense(h, use_bias=False, name="pc_proj_iou")
        # learnable temperature exists in the reference but its use is
        # commented out (constrast_module.py:32-33); keep for parity.
        self.param(
            "tau", lambda key: jnp.array([jnp.log(1.0 / 0.07)], jnp.float32)
        )

        pred_center = jax.lax.stop_gradient(pred_center)
        pred_size = jax.lax.stop_gradient(pred_size)
        ious = box3d_iou_aabb(
            gt_center[:, :, None, :],
            gt_size[:, :, None, :] + 1e-2,
            pred_center[:, None, :, :],
            pred_size[:, None, :, :],
        )  # (B, L, K)
        target = jax.lax.stop_gradient(
            (ious > self.iou_threshold).astype(jnp.float32)
        )

        obj_mask = objectness_masks  # (B, K)
        obj_cnt = jnp.maximum(jnp.sum(obj_mask, axis=-1), 1.0)  # (B,)
        lang_mask = (
            jnp.arange(l)[None, :] < lang_num[:, None]
        ).astype(jnp.float32)

        # ---- OCC: text CLS vs proposal features -------------------------
        text_n = _l2norm(text_proj(lang_emb))  # (B, L, H)
        box_n = _l2norm(pc_proj(bbox_feature))  # (B, K, H)
        sim_lang = jnp.einsum("blh,bkh->blk", text_n, box_n)
        logp = jax.nn.log_softmax(
            jnp.where(obj_mask[:, None, :] > 0, sim_lang, _NEG), axis=-1
        )
        # SoftCrossEntropy over the (1, obj_cnt) row = sum / obj_cnt; the
        # transposed term is identically 0; NCE averages the two -> /2.
        occ_per = -jnp.sum(logp * target * obj_mask[:, None, :], axis=-1)
        occ_per = occ_per / obj_cnt[:, None] / 2.0
        lang_con_loss = jnp.sum(occ_per * lang_mask) / b

        # ---- OSC: proposal vs proposal ---------------------------------
        box_iou_n = _l2norm(pc_proj_iou(bbox_feature))  # (B, K, H)
        sim_iou = jnp.einsum("bkh,bjh->bkj", box_iou_n, box_iou_n)
        pair_mask = obj_mask[:, :, None] * obj_mask[:, None, :]  # (B, K, K)
        logp_iou = jax.nn.log_softmax(
            jnp.where(obj_mask[:, None, :] > 0, sim_iou[:, None], _NEG),
            axis=-1,
        )  # (B, 1, K, K) rows masked over columns
        logp_iou = logp_iou[:, 0]
        target_pair = (
            target[:, :, :, None] * target[:, :, None, :]
        )  # (B, L, K, K) outer product of per-sentence masks
        # SoftCrossEntropy(v) + SoftCrossEntropy(t), each a mean over the
        # (obj_cnt, obj_cnt) matrix; sim is symmetric so both use logp_iou
        # of sim and sim^T respectively.
        logp_iou_t = jax.nn.log_softmax(
            jnp.where(
                obj_mask[:, None, :] > 0,
                jnp.swapaxes(sim_iou, 1, 2)[:, None],
                _NEG,
            ),
            axis=-1,
        )[:, 0]
        pm = pair_mask[:, None]  # (B, 1, K, K)
        osc_v = -jnp.sum(logp_iou[:, None] * target_pair * pm, axis=(-1, -2))
        osc_t = -jnp.sum(
            logp_iou_t[:, None] * target_pair * pm, axis=(-1, -2)
        )
        osc_per = (osc_v + osc_t) / 2.0 / (obj_cnt**2)[:, None]
        iou_con_loss = jnp.sum(osc_per * lang_mask) / b

        gate = (epoch >= 50).astype(jnp.float32)
        return {
            "lang_con_loss": lang_con_loss * gate,
            "iou_con_loss": iou_con_loss * gate,
        }
