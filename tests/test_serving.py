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


def test_caption_predictor_streams():
    """CaptionPredictor: per-proposal greedy captions, streamed == single."""
    from vlp3d.serving import CaptionPredictor

    config = tiny_config(no_caption=False, use_con=False)
    model = JointNet(config)
    b0 = make_batch(config, batch_size=2, num_points=256, istrain=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=True)
    )(b0)
    # forward variables: params incl. the trained caption submodule
    pred = CaptionPredictor(config, variables, batch_size=2)

    batches = [
        {
            k: np.asarray(
                make_batch(config, batch_size=2, num_points=256, seed=s)[k]
            )
            for k in STREAM_KEYS
        }
        for s in range(2)
    ]
    outs = pred(batches)
    assert len(outs) == 2
    k = config.model.num_proposal
    t = config.model.max_des_len + 2
    for o in outs:
        assert o["caption_ids"].shape == (2, k, t)
        assert (o["caption_ids"][:, :, 0] == 101).all()  # CLS start
        assert np.isfinite(o["pred_center"]).all()
    single = pred([batches[0]])[0]
    assert np.array_equal(single["caption_ids"], outs[0]["caption_ids"])


def test_caption_predictor_beam_mode():
    """num_beams>1 swaps in beam_decode: same output contract (shape, CLS
    start), deterministic across calls."""
    from vlp3d.serving import CaptionPredictor

    config = tiny_config(no_caption=False, use_con=False)
    model = JointNet(config)
    b0 = make_batch(config, batch_size=2, num_points=256, istrain=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=True)
    )(b0)
    pred = CaptionPredictor(config, variables, batch_size=2, num_beams=3)

    batch = {
        k: np.asarray(make_batch(config, batch_size=2, num_points=256)[k])
        for k in STREAM_KEYS
    }
    out = pred([batch])[0]
    k = config.model.num_proposal
    t = config.model.max_des_len + 2
    assert out["caption_ids"].shape == (2, k, t)
    assert (out["caption_ids"][:, :, 0] == 101).all()
    again = pred([batch])[0]
    assert np.array_equal(out["caption_ids"], again["caption_ids"])


def test_answer_predictor_topk():
    from vlp3d.serving import AnswerPredictor

    config = tiny_config(no_caption=True, use_con=False, use_answer=True)
    model = JointNet(config)
    b0 = make_batch(config, batch_size=2, num_points=256, istrain=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(b0)
    pred = AnswerPredictor(config, variables, topk=5, batch_size=2)
    batch = {
        k: np.asarray(
            make_batch(config, batch_size=2, num_points=256, seed=7)[k]
        )
        for k in STREAM_KEYS
    }
    out = pred([batch])[0]
    assert out["answer_top_ids"].shape[-1] == 5
    # top-1 id really is the argmax of the scores
    flat = out["answer_scores"].reshape(-1, out["answer_scores"].shape[-1])
    ids = out["answer_top_ids"].reshape(-1, 5)
    np.testing.assert_array_equal(ids[:, 0], np.argmax(flat, -1))


def test_mesh_sharded_predictor_matches_single_device():
    """Data-parallel serving: the same jitted program sharded over the
    8-device CPU mesh returns the same predictions (weights replicate,
    the batch axis shards; vlp3d/serving.py mesh= path)."""
    from vlp3d.parallel.mesh import make_mesh

    config = tiny_config(no_caption=True, use_con=False)
    model = JointNet(config)
    b0 = make_batch(config, batch_size=4, num_points=256, istrain=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(b0)

    mesh = make_mesh(4)
    plain = GroundingPredictor(config, variables, batch_size=4)
    sharded = GroundingPredictor(config, variables, batch_size=4, mesh=mesh)

    batches = [
        {
            k: np.asarray(
                make_batch(config, batch_size=4, num_points=256, seed=s)[k]
            )
            for k in STREAM_KEYS
        }
        for s in range(2)
    ]
    # single-batch dispatch and the streamed (lax.scan) dispatch
    for outs_p, outs_s in (
        (plain([batches[0]]), sharded([batches[0]])),
        (plain(batches), sharded(batches)),
    ):
        for a, b in zip(outs_p, outs_s):
            assert np.array_equal(a["pred_ref"], b["pred_ref"])
            np.testing.assert_allclose(
                a["pred_center"], b["pred_center"], rtol=1e-5, atol=1e-5
            )

    # indivisible batch is rejected up front
    import pytest

    with pytest.raises(ValueError, match="divisible"):
        GroundingPredictor(config, variables, batch_size=3, mesh=mesh)


def test_predictor_with_canonical_flags_needs_no_gt():
    """Regression: serving a checkpoint trained with the canonical run.sh
    flags (use_con=True, caption on) must not require GT label keys —
    the contrast branch (OCC/OSC loss inputs only) is skipped at
    is_eval=True. Caught live: the canonical-config server 500'd with
    KeyError 'ref_center_label_list' on every request."""
    config = tiny_config(no_caption=False, use_con=True)
    model = JointNet(config)
    b0 = make_batch(config, batch_size=2, num_points=256, istrain=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(b0)
    pred = GroundingPredictor(config, variables, batch_size=2)
    batch = {
        k: np.asarray(
            make_batch(config, batch_size=2, num_points=256, seed=7)[k]
        )
        for k in STREAM_KEYS  # serving batches carry ONLY these keys
    }
    out = pred([batch])[0]
    assert np.isfinite(out["pred_center"]).all()
    assert out["pred_ref"].shape[0] == 2


def test_run_padded_matches_host_padding():
    """Device-side occupancy padding (transfer k rows, pad on device)
    must match the old host-side pad-then-transfer path exactly."""
    config = tiny_config(no_caption=True, use_con=False)
    model = JointNet(config)
    b0 = make_batch(config, batch_size=4, num_points=256, istrain=0)
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(0)}, b, train=False)
    )(b0)
    pred = GroundingPredictor(config, variables, batch_size=4)
    full = {
        k: np.asarray(
            make_batch(config, batch_size=4, num_points=256, seed=3)[k]
        )
        for k in STREAM_KEYS
    }
    for k_occ in (1, 3, 4):
        part = {key: v[:k_occ] for key, v in full.items()}
        got = pred.run_padded(part)
        host_padded = {
            key: np.concatenate(
                [v] + [v[:1]] * (4 - k_occ), axis=0
            )
            for key, v in part.items()
        }
        want = pred([host_padded])[0]
        for key in want:
            np.testing.assert_array_equal(
                np.asarray(got[key]), np.asarray(want[key]), err_msg=key
            )
