"""Feature-flag matrix: each reference toggle composes and trains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.losses.joint import compute_joint_loss
from vlp3d.models.jointnet import JointNet


def run(config, *, reference=True, caption=False, epoch=60):
    batch = make_batch(config, batch_size=2, num_points=256, epoch=epoch)
    model = JointNet(config)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "aug": jax.random.key(2),
    }
    variables = model.init(rngs, batch, train=True)
    out, _ = model.apply(
        variables, batch, train=True, rngs=rngs, mutable=["batch_stats"]
    )
    loss, metrics = compute_joint_loss(
        config, out, batch, reference=reference, caption=caption
    )
    assert np.isfinite(float(loss))
    return out, metrics


@pytest.mark.slow
def test_no_reference_detection_only():
    out, m = run(tiny_config(no_reference=True, use_con=False),
                 reference=False)
    assert "cluster_ref" not in out
    assert float(m["box_loss"]) >= 0


def test_use_reg_head():
    out, m = run(tiny_config(use_reg_head=True, use_con=False))
    assert out["pred_center_reg"].shape[-1] == 3
    assert float(jnp.abs(out["pred_center_reg"]).max()) <= 0.05 + 1e-5


def test_use_kl_loss_and_vote_weight():
    out, m = run(
        tiny_config(use_kl_loss=True, use_vote_weight=True, use_con=False)
    )
    assert out["alpha"].shape[-1] == 6
    assert out["vote_weights"].shape[-1] == 1
    assert "vote_weight_loss" in m
    # the KL term must exist, be finite and non-zero (alpha != 0 at init
    # implies the 0.5*sum(alpha) terms are non-zero almost surely)
    assert "kl_loss" in m
    kl = float(m["kl_loss"])
    assert np.isfinite(kl) and kl != 0.0


def test_mask_box_changes_boxes():
    config = tiny_config(mask_box=True, use_con=False)
    out, _ = run(config)
    assert np.isfinite(np.asarray(out["pred_center"])).all()


def test_use_lang_emb_second_scorer():
    out, _ = run(tiny_config(use_lang_emb=True, use_con=False))
    assert out["cluster_ref"].shape == (2 * 4, 16)


def test_use_distil_text_encoder():
    """--use_distil swaps in the 6-layer DistilBERT encoder
    (lang_bert_module.py:30-45); no token-type table, all layers run."""
    out, m = run(tiny_config(use_distil=True, use_con=False))
    assert out["lang_fea"].shape[-1] == 128
    assert np.isfinite(float(m["ref_loss"]))


def test_caption_with_long_bert_sequences():
    """Canonical configs have bert_seq_len (50) > max_des_len+2 (32); the
    captioner must truncate to the des cap instead of overrunning its
    positional table (latent until benchmarks ran full shapes)."""
    cfg = tiny_config(no_caption=False, use_con=False, use_mlm=True)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, bert_seq_len=20, max_des_len=8)
    )
    out, m = run(cfg, caption=True)
    # predictions cover exactly the des window (t_cap - 1 shifted targets)
    assert out["lang_cap"].shape[1] == 8 + 2 - 1
    assert np.isfinite(float(m["cap_loss"]))
