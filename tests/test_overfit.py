"""End-to-end trainability: overfit one synthetic batch until grounding
accuracy reaches the proposal ceiling.

This is the strongest accuracy-coherence evidence available without real
ScanNet assets: it exercises dataset -> JointNet -> joint loss -> AdamW ->
eval (get_eval IoU path) and asserts the OID/ref objective actually moves
Acc@0.25 (not just the loss scalar). Mirrors the reference's "in-training
evaluation as the real test" strategy (SURVEY §4)."""

import numpy as np
import pytest
import jax

from vlp3d.data.dataset import BatchIterator
from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config
from vlp3d.eval.grounding import get_eval
from vlp3d.models.jointnet import JointNet
from vlp3d.train.optimizer import make_optimizer
from vlp3d.train.state import create_state, make_eval_step, make_train_step


@pytest.mark.slow
def test_overfit_one_batch_reaches_proposal_ceiling():
    config = tiny_config()
    ds = make_synthetic_dataset(
        config,
        n_scenes=2,
        n_points=config.dataset.num_points,
        anns_per_scene=4,
    )
    it = BatchIterator(ds, 2, epoch=0, rng=np.random.default_rng(0))
    batch = next(iter(it))
    batch = {k: v for k, v in batch.items() if not isinstance(v, list)}

    model = JointNet(config)
    opt = make_optimizer(lr_schedule=lambda e, lr0: lr0, steps_per_epoch=1000)
    state = create_state(model, opt, batch)
    train_step = jax.jit(make_train_step(model, config, opt))
    eval_step = jax.jit(make_eval_step(model, config))
    rng = jax.random.key(0)

    def ref_iou25(state):
        out, _ = eval_step(state, batch)
        g = get_eval(
            {
                k: np.asarray(v)
                for k, v in out.items()
                if not isinstance(v, (list, dict))
            },
            {k: np.asarray(v) for k, v in batch.items()},
            mean_size_arr=config.dataset.mean_size_arr(),
        )
        ious = np.asarray(g["ref_iou"])
        return float((ious >= 0.25).mean())

    first_loss = None
    metrics = {}
    step_i = 0
    for _ in range(301):
        state, metrics = train_step(
            state, batch, jax.random.fold_in(rng, step_i))
        step_i += 1
        if first_loss is None:
            first_loss = float(metrics["loss"])

    final_loss = float(metrics["loss"])
    assert final_loss < first_loss / 5, (first_loss, final_loss)

    # The exact step at which the match head catches the proposal ceiling
    # is trajectory-sensitive (an XLA codegen change reorders float
    # rounding and shifts it by hundreds of steps — observed across
    # environment updates with IDENTICAL code, same seed). The claim
    # under test is convergence, not a step count: keep training in
    # bounded increments until chosen-proposal accuracy reaches the
    # proposal-quality ceiling.
    ceiling = float(metrics["max_iou_rate_0.25"])
    acc25 = ref_iou25(state)
    while acc25 < ceiling - 1e-6 and step_i < 1501:
        for _ in range(100):
            state, metrics = train_step(
                state, batch, jax.random.fold_in(rng, step_i))
            step_i += 1
        ceiling = float(metrics["max_iou_rate_0.25"])
        acc25 = ref_iou25(state)

    # detection learned well enough that some proposals cover GT boxes...
    assert ceiling > 0.0
    # ...and the cross-modal match head learned to SELECT them: chosen-
    # proposal accuracy reaches the proposal-quality ceiling.
    assert acc25 >= ceiling - 1e-6, (acc25, ceiling, step_i)


@pytest.mark.slow
def test_overfit_caption_and_answer_heads():
    """Trainability of the captioning and VQA objectives: on one fixed
    batch, teacher-forced caption token accuracy and answer top-1
    accuracy must approach 1 (not just the loss scalar falling). This is
    the caption/answer analogue of the grounding overfit above."""
    from vlp3d.data.synthetic import make_batch

    config = tiny_config(no_caption=False, use_answer=True)
    batch = make_batch(
        config, batch_size=2, num_points=config.dataset.num_points,
        istrain=1,
    )
    model = JointNet(config)
    opt = make_optimizer(lr_schedule=lambda e, lr0: lr0, steps_per_epoch=1000)
    state = create_state(model, opt, batch)
    train_step = jax.jit(
        make_train_step(model, config, opt, caption=True)
    )
    eval_step = jax.jit(make_eval_step(model, config, caption=True))
    rng = jax.random.key(0)

    first = None
    metrics = {}
    for i in range(301):
        state, metrics = train_step(state, batch, jax.random.fold_in(rng, i))
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}

    assert float(metrics["cap_loss"]) < first["cap_loss"] / 5
    assert float(metrics["answer_loss"]) < first["answer_loss"] / 5
    # teacher-forced next-token accuracy over non-pad tokens of good boxes
    assert float(metrics["cap_acc"]) > 0.9, float(metrics["cap_acc"])

    out, _ = eval_step(state, batch)
    pred_ans = np.argmax(np.asarray(out["answer_scores"]), axis=1)
    labels = np.asarray(batch["answer_cat"]).reshape(-1)
    lang_num = np.asarray(batch["lang_num"])
    l = config.model.lang_num_max
    valid = (np.arange(len(labels)) % l) < lang_num[
        np.arange(len(labels)) // l
    ]
    em1 = (pred_ans == labels)[valid].mean()
    assert em1 > 0.9, em1
