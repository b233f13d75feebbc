"""<60 s smoke tier (`pytest -m smoke`): the judge/CI liveness check.

Budgeted for ONE core, cold compilation cache:
  - import every vlp3d module                (~5 s)
  - ONE fused jit (init + train-mode forward + joint loss) on the tiny
    grounding config — a single XLA compile covering backbone, voting,
    proposal, relation, BERT, match, and every joint loss term (~30 s)
  - host-side fast paths: synthetic batch construction, WordPiece
    tokenizer round-trip, grounding-eval breakdown, caption scorers,
    VQA accuracy                             (~5 s)

Caption/answer/MLM heads are covered by the default tier (their extra
compile would blow the 60 s budget); this tier answers "is the package
alive end to end", not "is it parity-exact".
"""

import pkgutil
import importlib

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.smoke


def test_import_every_module():
    import vlp3d

    failed = []
    for mod in pkgutil.walk_packages(vlp3d.__path__, "vlp3d."):
        try:
            importlib.import_module(mod.name)
        except Exception as exc:  # pragma: no cover - report all at once
            failed.append(f"{mod.name}: {exc!r}")
    assert not failed, "\n".join(failed)


def test_joint_forward_and_loss_single_compile():
    """init + train-mode forward + every joint loss term in ONE jitted
    program. Gradients/optimizer are covered by the default tier — the
    backward graph roughly doubles the cold compile and busts the 60 s
    budget on a contended single core."""
    from vlp3d.data.synthetic import make_batch, tiny_config
    from vlp3d.losses.joint import compute_joint_loss
    from vlp3d.models.jointnet import JointNet

    config = tiny_config()
    # epoch 0: contrast weights gate to zero at trace time — compiling the
    # OCC/OSC graph too would blow the 60 s budget (covered in default tier)
    batch = make_batch(config, batch_size=1, num_points=256, epoch=0)
    model = JointNet(config)
    rngs = {
        "params": jax.random.key(0),
        "dropout": jax.random.key(1),
        "aug": jax.random.key(2),
    }

    def step(b):
        variables = model.init(rngs, b, train=True)
        out, _ = model.apply(
            variables, b, train=True, rngs=rngs, mutable=["batch_stats"]
        )
        return compute_joint_loss(config, out, b)

    loss, metrics = jax.jit(step)(batch)
    assert np.isfinite(float(loss))
    for key in (
        "vote_loss", "objectness_loss", "box_loss", "ref_loss",
        "diou_loss", "lang_loss", "lang_con_loss", "iou_con_loss",
    ):
        assert np.isfinite(float(metrics[key])), key


def test_synthetic_batch_and_tokenizer():
    from vlp3d.data.synthetic import make_batch, tiny_config
    from vlp3d.data.tokenizer import load_tokenizer

    config = tiny_config()
    batch = make_batch(config, batch_size=2, num_points=256)
    assert batch["point_clouds"].shape[0] == 2
    for key in ("lang_num", "ref_center_label_list", "vote_label"):
        assert key in batch, key

    tok = load_tokenizer()
    enc = tok(["the brown chair next to the table"], max_length=16)
    assert enc["input_ids"].shape == (1, 16)
    assert enc["attention_mask"].sum() > 2


def test_host_eval_math():
    from vlp3d.eval.capeval import Bleu, Cider, Meteor, Rouge
    from vlp3d.eval.grounding import final_eval_breakdown

    gts = {"a": ["the red chair by the door", "a red chair"],
           "b": ["a wooden table"]}
    res = {"a": ["the red chair near the door"], "b": ["a wooden desk"]}
    for scorer in (Bleu(4), Cider(), Rouge(), Meteor()):
        score, _ = scorer.compute_score(gts, res)
        score = score[-1] if isinstance(score, (list, tuple)) else score
        assert np.isfinite(float(score)) and float(score) >= 0.0

    ious = np.array([0.6, 0.3, 0.1, 0.55])
    multiple = np.array([0, 1, 1, 0])
    others = np.array([0, 0, 1, 0])
    out = final_eval_breakdown(ious, multiple, others)
    assert isinstance(out, dict) and out
