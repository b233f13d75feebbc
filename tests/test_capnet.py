"""CapNet legacy captioner: forward shapes + cap-loss wiring + grads
(the 3DJCG/Scan2Cap path, models/capnet/capnet.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.losses.captioning import compute_cap_loss
from vlp3d.models.capnet import CapNet


def test_capnet_forward_and_cap_loss():
    config = tiny_config()
    batch = make_batch(config, batch_size=2, num_points=256)
    b, l = 2, config.model.lang_num_max
    t = 12
    rng = np.random.default_rng(0)
    batch["lang_feat"] = rng.normal(size=(b, l, t, 300)).astype(np.float32)
    vocab = 97
    model = CapNet(config, vocab_size=vocab)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)

    lang_cap = out["lang_cap"]  # (B*L, T-1, vocab) next-word logits
    assert lang_cap.shape == (b * l, t - 1, vocab)
    assert np.isfinite(np.asarray(lang_cap)).all()

    lang_ids = rng.integers(0, vocab, (b, l, t)).astype(np.int64)
    lang_ids[:, :, -3:] = 0  # pad tail
    loss, acc = compute_cap_loss(
        lang_cap, jnp.asarray(lang_ids), out["good_bbox_masks"]
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert 0.0 <= float(acc) <= 1.0

    # gradient flows into the captioner params
    def f(params):
        o = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            batch, train=False,
        )
        return compute_cap_loss(
            o["lang_cap"], jnp.asarray(lang_ids), o["good_bbox_masks"]
        )[0]

    g = jax.grad(f)(variables["params"])
    gnorm = sum(
        float(jnp.sum(jnp.abs(x)))
        for x in jax.tree_util.tree_leaves(g["caption"])
    )
    assert gnorm > 0
