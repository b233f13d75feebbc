"""GroundingPredictor: streamed multi-batch predictions match
single-batch predictions (one dispatch per stream)."""

import numpy as np
import jax

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.models.jointnet import JointNet
from vlp3d.serving import STREAM_KEYS, GroundingPredictor


def test_streamed_matches_single_batch():
    config = tiny_config(no_caption=True, use_con=False)
    model = JointNet(config)
    b0 = make_batch(config, batch_size=2, num_points=256, istrain=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(b0)
    pred = GroundingPredictor(config, variables, batch_size=2)

    batches = [
        {
            k: np.asarray(
                make_batch(config, batch_size=2, num_points=256, seed=s)[k]
            )
            for k in STREAM_KEYS
        }
        for s in range(3)
    ]
    outs = pred(batches)
    singles = [pred([b])[0] for b in batches]
    assert len(outs) == 3
    for a, s in zip(outs, singles):
        assert np.array_equal(a["pred_ref"], s["pred_ref"])
        np.testing.assert_allclose(
            a["pred_center"], s["pred_center"], rtol=1e-5, atol=1e-5
        )
        assert np.isfinite(a["pred_size"]).all()
