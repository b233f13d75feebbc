"""ScanQA loss + eval tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.eval.vqa import answer_accuracy
from vlp3d.losses.vqa import compute_vqa_loss


def test_scanqa_loss_end_to_end():
    config = tiny_config(use_con=False)
    batch = make_batch(config, batch_size=2, num_points=256)
    b, t = 2, 12
    batch["lang_feat"] = np.random.default_rng(0).normal(
        size=(b, t, 300)
    ).astype(np.float32)
    batch["lang_len"] = np.full((b,), 6, np.int32)
    batch["ref_center_label"] = batch["ref_center_label_list"][:, 0]
    batch["ref_size_class_label"] = batch["ref_size_class_label_list"][:, 0]
    batch["ref_size_residual_label"] = batch[
        "ref_size_residual_label_list"
    ][:, 0]
    batch["object_cat"] = batch["object_cat_list"][:, 0]
    batch["answer_cat"] = np.array([3, 7], np.int32)

    from vlp3d.models.scanqa import ScanQA

    model = ScanQA(config, num_answers=64)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    loss, metrics = compute_vqa_loss(
        out, batch, config.dataset.mean_size_arr()
    )
    assert np.isfinite(float(loss))
    for k in ("vote_loss", "box_loss", "ref_loss", "answer_loss",
              "lang_loss", "center_loss", "size_reg_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_answer_accuracy():
    scores = jnp.array(
        [[0.1, 0.9, 0.0, 0.0], [0.8, 0.1, 0.0, 0.05]]
    )
    cats = jnp.array([[0, 1, 0, 0], [0, 0, 1, 0]], jnp.float32)
    a1, a2 = answer_accuracy(scores, cats, topk=2)
    assert float(a1) == 0.5  # sample 0 top1 correct, sample 1 wrong
    assert float(a2) == 0.5  # top-2 of sample 1 = {0, 1}, miss answer 2
    _, a4 = answer_accuracy(scores, cats, topk=4)
    assert float(a4) == 1.0


def test_answer_accuracy_parity_vs_reference_transcription():
    """Numpy transcription of lib/vqa/eval_helper.py:228-237:
    acc@1 = (one_hot(argmax) * cats).max(1).mean(),
    acc@10 = (one_hot(topk).sum(1) * cats).max(1).mean()."""
    rng = np.random.default_rng(1)
    b, a, k = 16, 32, 10
    scores = rng.normal(size=(b, a)).astype(np.float32)
    cats = (rng.random((b, a)) < 0.1).astype(np.float32)

    def oracle(scores, cats, topk):
        at1 = scores.argmax(1)
        oh1 = np.eye(a)[at1]
        acc1 = (oh1 * cats).max(1).mean()
        idx = np.argsort(-scores, axis=1)[:, :topk]
        ohk = np.zeros((b, a))
        for i in range(b):
            ohk[i, idx[i]] = 1
        acck = (ohk * cats).max(1).mean()
        return acc1, acck

    o1, ok = oracle(scores, cats, k)
    a1, ak = answer_accuracy(jnp.asarray(scores), jnp.asarray(cats), topk=k)
    np.testing.assert_allclose(float(a1), o1, rtol=1e-6)
    np.testing.assert_allclose(float(ak), ok, rtol=1e-6)
