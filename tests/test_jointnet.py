"""JointNet forward + joint loss smoke tests on tiny synthetic scenes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.losses.joint import compute_joint_loss
from vlp3d.models.jointnet import JointNet


def init_and_forward(config, batch, *, train=False):
    model = JointNet(config)
    rngs = {"params": jax.random.key(0)}
    if train:
        rngs["dropout"] = jax.random.key(1)
        rngs["aug"] = jax.random.key(2)
    variables = model.init(rngs, batch, train=train)
    mutable = ["batch_stats"] if train else False
    out = model.apply(
        variables, batch, train=train, rngs=rngs if train else None,
        mutable=mutable,
    )
    if train:
        out, _ = out
    return model, variables, out


class TestJointNetForward:
    def test_eval_forward_shapes(self):
        config = tiny_config()
        batch = make_batch(config, batch_size=2, num_points=256)
        _, _, out = init_and_forward(config, batch, train=False)

        b, l = 2, config.model.lang_num_max
        k = config.model.num_proposal
        assert out["aggregated_vote_xyz"].shape == (b, k, 3)
        assert out["objectness_scores"].shape == (b, k, 2)
        assert out["pred_center"].shape == (b, k, 3)
        assert "pred_bbox_corner" not in out  # corners stay out of the jit
        assert out["bbox_feature"].shape == (b, k, 128)
        assert out["cluster_ref"].shape == (b * l, k)
        assert out["lang_emb"].shape == (b * l, 128)
        assert out["lang_scores"].shape == (b * l, 18)
        for key in ("pred_center", "pred_size", "cluster_ref"):
            assert bool(jnp.isfinite(out[key]).all()), key

    def test_train_forward_and_loss(self):
        config = tiny_config()
        batch = make_batch(config, batch_size=2, num_points=256, epoch=0)
        _, _, out = init_and_forward(config, batch, train=True)
        loss, metrics = compute_joint_loss(config, out, batch)
        assert np.isfinite(float(loss))
        for key in (
            "vote_loss", "objectness_loss", "box_loss", "ref_loss",
            "diou_loss", "lang_loss", "lang_con_loss", "iou_con_loss",
        ):
            assert np.isfinite(float(metrics[key])), key
        # contrast gated off before epoch 50
        assert float(metrics["lang_con_loss"]) == 0.0
        assert float(metrics["iou_con_loss"]) == 0.0

    def test_contrast_active_after_epoch50(self):
        config = tiny_config()
        batch = make_batch(config, batch_size=2, num_points=256, epoch=60)
        _, _, out = init_and_forward(config, batch, train=True)
        loss, metrics = compute_joint_loss(config, out, batch)
        assert np.isfinite(float(metrics["lang_con_loss"]))
        assert np.isfinite(float(metrics["iou_con_loss"]))
        assert np.isfinite(float(loss))

    def test_caption_and_answer_heads(self):
        config = tiny_config(no_caption=False, use_answer=True, use_mlm=True)
        batch = make_batch(config, batch_size=2, num_points=256)
        _, _, out = init_and_forward(config, batch, train=True)
        b, l = 2, config.model.lang_num_max
        t = config.model.bert_seq_len
        k = config.model.num_proposal
        # captioner consumes des sequences capped at max_des_len+2
        t_cap = min(t, config.model.max_des_len + 2)
        assert out["lang_cap"].shape == (
            b * l, t_cap - 1, config.model.vocab_size
        )
        assert out["answer_scores"].shape == (b * l, config.model.num_answers)
        assert out["lang_mlm"].shape == (b * l, t - 1, config.model.vocab_size)
        loss, metrics = compute_joint_loss(config, out, batch, caption=True)
        assert np.isfinite(float(loss))
        assert np.isfinite(float(metrics["cap_loss"]))
        assert np.isfinite(float(metrics["mlm_loss"]))
        assert np.isfinite(float(metrics["answer_loss"]))


class TestGreedyDecode:
    def test_decode_shapes(self):
        from vlp3d.models.caption import CaptionDecoder, greedy_decode

        dec = CaptionDecoder(vocab_size=100, n_layers=2, max_len=12)
        obj = jnp.ones((4, 1, 128))
        seq = jnp.ones((4, 9), jnp.int32)
        from vlp3d.models.caption import causal_caption_mask

        variables = dec.init(
            jax.random.key(0), obj, seq, causal_caption_mask(seq)
        )
        ys = greedy_decode(dec, variables, obj, max_len=8)
        assert ys.shape == (4, 10)
        assert (np.asarray(ys[:, 0]) == 101).all()
