"""Loss parity vs numpy transcriptions of the reference's loops.

Oracles transcribe lib/loss_helper/loss_grounding.py:129-365 (OID) and
loss_detection.py:24-113 semantics directly, including the quirks (raw
argmax for one-hot labels vs masked argmax for smooth labels, epoch-50
smoothing, batch-size-only diou normalization).
"""

import numpy as np
import jax.numpy as jnp

from vlp3d.losses.detection import compute_objectness_loss, compute_vote_loss
from vlp3d.losses.grounding import compute_diou_loss


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def diou_pair(c1, s1, c2, s2):
    min1, max1 = c1 - s1 / 2, c1 + s1 / 2
    min2, max2 = c2 - s2 / 2, c2 + s2 / 2
    inter = np.prod(np.clip(np.minimum(max1, max2) - np.maximum(min1, min2), 0, None), -1)
    union = np.prod(s1, -1) + np.prod(s2, -1) - inter
    iou = inter / union
    diag = ((c1 - c2) ** 2).sum(-1)
    outer = np.clip(np.maximum(max1, max2) - np.minimum(min1, min2), 0, None)
    diou = np.clip(iou - 1.5 * diag / (outer ** 2).sum(-1), -1, 1)
    return iou, diou


def oracle_diou_loss(pred_center, pred_size, cluster_ref, obj_masks,
                     gt_center, gt_size, lang_num, epoch, istrain, rand):
    """Transcription of compute_diou_loss (loss_grounding.py:185-365)."""
    b, k = pred_center.shape[:2]
    l = gt_center.shape[1]
    preds = cluster_ref.reshape(b, l, k)
    loss = 0.0
    diou_loss = 0.0
    n25 = n5 = 0
    for i in range(b):
        labels = np.zeros((l, k))
        smooth = np.zeros((l, k))
        dious_rows = []
        for j in range(l):
            if j >= lang_num[i]:
                dious_rows.append(np.zeros(k))
                continue
            ious, dious = diou_pair(
                pred_center[i], pred_size[i],
                np.tile(gt_center[i, j], (k, 1)),
                np.tile(gt_size[i, j], (k, 1)),
            )
            dious_rows.append(dious)
            ious_np = ious.copy()
            if istrain and rand < 0.5:
                ious = ious * obj_masks[i]
            ious_ind = int(np.argmax(ious_np))  # RAW argmax (reference quirk)
            max_ious = ious_np[ious_ind]
            if max_ious >= 0.25:
                labels[j, ious_ind] = 1
                if epoch < 50:
                    smooth_mask = ious >= 0.25
                    cnt = smooth_mask.sum()
                    if cnt >= 2:
                        smooth[j, smooth_mask] = 0.05 / (cnt - 1)
                        smooth[j, int(np.argmax(ious))] = 0.95
                    else:
                        smooth[j, int(np.argmax(ious))] = 1
                else:
                    smooth[j, int(np.argmax(ious))] = 1
                n25 += 1
            if max_ious >= 0.5:
                n5 += 1
        valid = int(lang_num[i])
        probs = np_softmax(preds[i, :valid] + 1e-8)
        loss += (-(np.log(probs + 1e-8) * smooth[:valid]).sum(-1)).mean()
        dious_arr = np.stack(dious_rows)
        diou_loss += ((1 - dious_arr[:valid]) * smooth[:valid]).sum()
    total = lang_num.sum()
    return (loss / b, diou_loss / b, labels, n25 / total, n5 / total)


def test_diou_loss_parity(rng):
    b, k, l = 2, 12, 4
    pred_center = rng.uniform(0, 4, (b, k, 3)).astype(np.float32)
    pred_size = rng.uniform(0.4, 1.2, (b, k, 3)).astype(np.float32)
    # put some GT boxes right on top of predictions so iou >= 0.25 happens
    gt_center = pred_center[:, :l].copy() + rng.normal(0, 0.05, (b, l, 3)).astype(np.float32)
    gt_size = pred_size[:, :l].copy()
    cluster_ref = rng.normal(size=(b * l, k)).astype(np.float32)
    obj_masks = rng.integers(0, 2, (b, k)).astype(np.float32)
    lang_num = np.array([3, 4], np.int32)

    for epoch, istrain, rand in [(10, 1, 0.3), (10, 0, 0.7), (60, 1, 0.3)]:
        out = compute_diou_loss(
            pred_center=jnp.asarray(pred_center),
            pred_size=jnp.asarray(pred_size),
            cluster_ref=jnp.asarray(cluster_ref),
            objectness_masks=jnp.asarray(obj_masks),
            gt_center=jnp.asarray(gt_center),
            gt_size=jnp.asarray(gt_size),
            lang_num=jnp.asarray(lang_num),
            epoch=jnp.int32(epoch),
            istrain=jnp.int32(istrain),
            random_gate=jnp.float32(rand),
        )
        ref, dref, _, r25, r5 = oracle_diou_loss(
            pred_center, pred_size, cluster_ref, obj_masks,
            gt_center, gt_size, lang_num, epoch, istrain, rand,
        )
        np.testing.assert_allclose(float(out["ref_loss"]), ref, rtol=1e-4,
                                   err_msg=f"epoch={epoch}")
        np.testing.assert_allclose(float(out["diou_loss"]), dref, rtol=1e-4)
        np.testing.assert_allclose(float(out["max_iou_rate_0.25"]), r25, rtol=1e-5)
        np.testing.assert_allclose(float(out["max_iou_rate_0.5"]), r5, rtol=1e-5)


def oracle_kl_loss(pred_center, gt_center, alpha, lang_num):
    """Transcription of the use_kl_loss branch (loss_grounding.py:151-153,
    282-286, 309-321): per batch, SmoothL1Loss() (mean-reduced scalar) of
    the raw-argmax proposal centers vs GT, times sum(exp(-alpha_center)),
    plus 0.5*sum(alpha_center) + 0.5*sum(alpha_size); the size SmoothL1 is
    pred-vs-pred == 0 in the reference. alpha_size = alpha[:, :, 4:6]."""
    b = pred_center.shape[0]
    kl = 0.0
    for i in range(b):
        a_c = alpha[i, :, 0:3]
        a_s = alpha[i, :, 4:6]
        diffs = []
        for j in range(int(lang_num[i])):
            ious, _ = diou_pair(
                pred_center[i],
                np.ones_like(pred_center[i]),
                np.tile(gt_center[i, j], (pred_center.shape[1], 1)),
                np.ones((pred_center.shape[1], 3)),
            )
            ind = int(np.argmax(ious))
            diffs.append(pred_center[i, ind] - gt_center[i, j])
        d = np.abs(np.stack(diffs))
        sl1 = np.where(d < 1.0, 0.5 * d * d, d - 0.5).mean()
        kl += (np.exp(-a_c) * sl1 + 0.5 * a_c).sum() + (0.5 * a_s).sum()
    return kl / b


def test_kl_loss_parity(rng):
    b, k, l = 2, 12, 4
    pred_center = rng.uniform(0, 4, (b, k, 3)).astype(np.float32)
    pred_size = np.ones((b, k, 3), np.float32)
    gt_center = pred_center[:, :l].copy() + rng.normal(
        0, 0.05, (b, l, 3)
    ).astype(np.float32)
    gt_size = np.ones((b, l, 3), np.float32)
    cluster_ref = rng.normal(size=(b * l, k)).astype(np.float32)
    alpha = rng.uniform(-0.05, 0.05, (b, k, 6)).astype(np.float32)
    lang_num = np.array([3, 4], np.int32)

    out = compute_diou_loss(
        pred_center=jnp.asarray(pred_center),
        pred_size=jnp.asarray(pred_size),
        cluster_ref=jnp.asarray(cluster_ref),
        objectness_masks=jnp.ones((b, k), jnp.float32),
        gt_center=jnp.asarray(gt_center),
        gt_size=jnp.asarray(gt_size),
        lang_num=jnp.asarray(lang_num),
        epoch=jnp.int32(10),
        istrain=jnp.int32(1),
        random_gate=jnp.float32(0.9),
        alpha=jnp.asarray(alpha),
    )
    ref = oracle_kl_loss(pred_center, gt_center, alpha, lang_num)
    np.testing.assert_allclose(float(out["kl_loss"]), ref, rtol=1e-4)

    # the gradient must reach alpha (preds/GT are detached in the reference)
    import jax

    def kl_of(a):
        return compute_diou_loss(
            pred_center=jnp.asarray(pred_center),
            pred_size=jnp.asarray(pred_size),
            cluster_ref=jnp.asarray(cluster_ref),
            objectness_masks=jnp.ones((b, k), jnp.float32),
            gt_center=jnp.asarray(gt_center),
            gt_size=jnp.asarray(gt_size),
            lang_num=jnp.asarray(lang_num),
            epoch=jnp.int32(10),
            istrain=jnp.int32(1),
            random_gate=jnp.float32(0.9),
            alpha=a,
        )["kl_loss"]

    g = jax.grad(kl_of)(jnp.asarray(alpha))
    assert float(jnp.abs(g[:, :, 0:3]).max()) > 0  # center channels live
    assert float(jnp.abs(g[:, :, 4:6]).max()) > 0  # size channels live
    np.testing.assert_allclose(np.asarray(g[:, :, 3]), 0.0)  # unused channel


def test_objectness_loss_parity(rng):
    b, k, k2 = 2, 16, 8
    agg = rng.uniform(0, 4, (b, k, 3)).astype(np.float32)
    scores = rng.normal(size=(b, k, 2)).astype(np.float32)
    centers = rng.uniform(0, 4, (b, k2, 3)).astype(np.float32)

    loss, label, mask, assign = compute_objectness_loss(
        jnp.asarray(agg), jnp.asarray(scores), jnp.asarray(centers)
    )
    # oracle (loss_detection.py:73-113)
    d = ((agg[:, :, None] - centers[:, None]) ** 2).sum(-1)
    dist1 = d.min(-1)
    ind1 = d.argmin(-1)
    euclid = np.sqrt(dist1 + 1e-6)
    label_w = (euclid < 0.3).astype(int)
    mask_w = ((euclid < 0.3) | (euclid > 0.3)).astype(float)
    w = np.array([0.2, 0.8])[label_w]
    logp = np.log(np_softmax(scores))
    ce = -w * np.take_along_axis(logp, label_w[..., None], -1)[..., 0]
    loss_w = (ce * mask_w).sum() / (mask_w.sum() + 1e-6)
    np.testing.assert_array_equal(np.asarray(label), label_w)
    np.testing.assert_array_equal(np.asarray(assign), ind1)
    np.testing.assert_allclose(float(loss), loss_w, rtol=1e-5)


def test_vote_loss_parity(rng):
    b, s, n = 2, 32, 128
    seed_xyz = rng.uniform(0, 4, (b, s, 3)).astype(np.float32)
    vote_xyz = seed_xyz + rng.normal(0, 0.2, (b, s, 3)).astype(np.float32)
    seed_inds = rng.integers(0, n, (b, s)).astype(np.int32)
    vote_label = rng.normal(0, 0.3, (b, n, 9)).astype(np.float32)
    vote_mask = rng.integers(0, 2, (b, n)).astype(np.int64)

    got = float(
        compute_vote_loss(
            jnp.asarray(seed_xyz), jnp.asarray(vote_xyz),
            jnp.asarray(seed_inds), jnp.asarray(vote_label),
            jnp.asarray(vote_mask),
        )
    )
    # oracle (loss_detection.py:24-71), vote_factor=1
    total = 0.0
    msum = 0.0
    for i in range(b):
        for j in range(s):
            if vote_mask[i, seed_inds[i, j]] == 0:
                continue
            gts = vote_label[i, seed_inds[i, j]].reshape(3, 3) + seed_xyz[i, j]
            dists = [np.abs(vote_xyz[i, j] - g).sum() for g in gts]
            total += min(dists)
            msum += 1
    want = total / (msum + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ranking_loss_variants_parity(rng):
    """Focal/sigmoid ranking variants vs transcriptions of loss.py:20-98."""
    from vlp3d.losses.grounding import (
        sigmoid_ranking_focal_loss,
        sigmoid_ranking_loss,
        softmax_ranking_focal_loss,
    )

    x = rng.normal(size=(6, 16)).astype(np.float32)
    t = (rng.uniform(size=(6, 16)) < 0.2).astype(np.float32)
    t[:, 0] = 1.0  # every row has a positive
    mask = (rng.uniform(size=(6,)) < 0.7).astype(np.float32)

    # SoftmaxRankingFocalLoss (loss.py:32-51), alpha=ones, gamma=2
    probs = np_softmax(x + 1e-8)
    p = (probs * t).sum(-1)
    a = t.sum(-1)  # ones[cls] dotted with targets
    per_row = -a * (1 - p) ** 2 * np.log(p + 1e-8)
    np.testing.assert_allclose(
        float(softmax_ranking_focal_loss(jnp.asarray(x), jnp.asarray(t))),
        per_row.mean(), rtol=1e-5)
    np.testing.assert_allclose(
        float(softmax_ranking_focal_loss(
            jnp.asarray(x), jnp.asarray(t), mask=jnp.asarray(mask))),
        (per_row * mask).sum() / (mask.sum() + 1e-8), rtol=1e-5)

    # SigmoidRankingLoss (loss.py:58-70)
    s = 1 / (1 + np.exp(-x))
    bce = -np.log(s + 1e-8) * t - np.log(1 - s + 1e-8) * (1 - t)
    np.testing.assert_allclose(
        float(sigmoid_ranking_loss(jnp.asarray(x), jnp.asarray(t))),
        bce.mean(), rtol=1e-5)

    # SigmoidRankingFocalLoss (loss.py:84-98), alpha=(1,1), gamma=2
    pos = -((1 - s) ** 2) * np.log(s + 1e-8) * t
    neg = -(s ** 2) * np.log(1 - s + 1e-8) * (1 - t)
    focal = pos + neg
    np.testing.assert_allclose(
        float(sigmoid_ranking_focal_loss(jnp.asarray(x), jnp.asarray(t))),
        focal.mean(), rtol=1e-5)
    m2 = (rng.uniform(size=x.shape) < 0.5).astype(np.float32)
    np.testing.assert_allclose(
        float(sigmoid_ranking_focal_loss(
            jnp.asarray(x), jnp.asarray(t), mask=jnp.asarray(m2))),
        (focal * m2).sum() / (m2.sum() + 1e-8), rtol=1e-5)


def test_debug_diagnostics_parity(rng):
    """--debug diagnostics vs a loop transcription of
    loss_grounding.py:262-306, 327-345."""
    from vlp3d.losses.grounding import compute_debug_diagnostics

    b, l, k, nc = 3, 4, 32, 18
    ious = rng.uniform(size=(b, l, k)).astype(np.float32)
    preds = rng.normal(size=(b * l, k)).astype(np.float32)
    object_cat = rng.integers(0, nc, (b, l))
    gt_size = rng.uniform(0.2, 2.0, (b, l, 3)).astype(np.float32)
    lang_num = np.array([4, 2, 3])

    got = {
        kk: np.asarray(v)
        for kk, v in compute_debug_diagnostics(
            ious=jnp.asarray(ious),
            cluster_ref=jnp.asarray(preds),
            object_cat=jnp.asarray(object_cat),
            gt_size=jnp.asarray(gt_size),
            lang_num=jnp.asarray(lang_num),
            num_class=nc,
        ).items()
    }

    total = lang_num.sum()
    top_iou = np.zeros(5)
    pred25, pred5 = [], []
    class_iou = np.zeros(nc)
    class_size = np.zeros(nc)
    class_cnt = np.zeros(nc)
    top_ind = []
    cl_preds = preds.reshape(b, l, k)
    for i in range(b):
        ranks = []
        for j in range(lang_num[i]):
            s = np.sort(ious[i, j])
            top_iou += s[-5:]
            pred25.append((ious[i, j] >= 0.25).mean())
            pred5.append((ious[i, j] >= 0.5).mean())
            ci = cl_preds[i, j].argmax()
            class_iou[object_cat[i, j]] += ious[i, j, ci]
            class_size[object_cat[i, j]] += np.prod(gt_size[i, j])
            class_cnt[object_cat[i, j]] += 1
            ranks.append(np.argsort(ious[i, j]).tolist().index(ci))
        top_ind.append(np.mean(ranks))
    class_cnt[class_cnt == 0] += 1
    class_iou /= class_cnt
    class_size /= class_cnt

    for kk in range(1, 6):
        np.testing.assert_allclose(
            got[f"top_iou_rate_{kk}"], top_iou[5 - kk] / total, rtol=1e-5)
    np.testing.assert_allclose(got["pred_iou_rate_0.25"], np.mean(pred25),
                               rtol=1e-5)
    np.testing.assert_allclose(got["pred_iou_rate_0.5"], np.mean(pred5),
                               rtol=1e-5)
    from vlp3d.config import SCANNET_TYPES
    for i, name in enumerate(SCANNET_TYPES):
        np.testing.assert_allclose(got[f"class_iou_rate_{name}"],
                                   class_iou[i], rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(got[f"class_size_{name}"],
                                   class_size[i], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got["top_ind"], np.mean(top_ind) + 1,
                               rtol=1e-5)


def test_legacy_pretrain_contrastive_parity(rng):
    """compute_contrastive_loss vs a transcription of the reference's
    boolean-indexing form (loss_pretrain.py:4-36)."""
    from vlp3d.losses.pretrain import compute_contrastive_loss

    B, L, K = 3, 4, 12
    total = B * L
    sim_l2p = rng.normal(size=(total, K)).astype(np.float32)
    sim_p2l = rng.normal(size=(K, total)).astype(np.float32)
    positive_labels = rng.integers(0, K, size=(total,))
    contrast_mask = (rng.random((B, L)) < 0.7).astype(np.float32)
    contrast_mask[0, 0] = 1.0  # at least one valid row

    got = float(
        compute_contrastive_loss(
            jnp.asarray(sim_l2p), jnp.asarray(sim_p2l),
            jnp.asarray(positive_labels), jnp.asarray(contrast_mask),
        )
    )

    mask = contrast_mask.reshape(total).astype(bool)
    sel_l2p = sim_l2p[:, positive_labels][mask][:, mask]
    sel_p2l = sim_p2l[positive_labels, :][mask][:, mask]

    def nce(s):
        ls = s - np.log(np.exp(s - s.max(1, keepdims=True)).sum(1, keepdims=True)) - s.max(1, keepdims=True)
        return float(-np.diagonal(ls).mean())

    want = (nce(sel_l2p) + nce(sel_p2l)) / B
    np.testing.assert_allclose(got, want, rtol=1e-5)
