"""DIRECT optimizer parity: the reference's vendored AdamW
(scripts/utils/AdamW.py), its substring param grouping
(scripts/utils/script_utils.py::set_params_lr_dict), and its torch LR
schedulers (train_3dvlp.py:180-196) vs our optax chain
(vlp3d/train/optimizer.py + vlp3d/train/schedules.py).

Three claims are pinned here:

1. Group assignment. set_params_lr_dict matches keys by *substring over
   the full dotted param name* (script_utils.py:10-21), so beyond the
   four top-level modules it also catches `positive_match.*` (contains
   "match") and `answer.lang_feat_linear/attflat_lang.*` (contain
   "lang"). Both are dormant in the reference's live forward path
   (positive_match is never called; answer_module.py:110-113 only uses
   attflat_visual), so our top-level labeling
   (optimizer.py::label_params) is functionally identical — this test
   enumerates the oracle assignment on a name tree shaped like the
   reference JointNet and proves the only divergences are those dormant
   params.

2. Update trajectory. Vendored AdamW (decoupled decay, amsgrad on/off)
   + CosineAnnealingLR(T_max, eta_min=1e-5) *stepped per epoch on each
   group's own base LR* must match our optax chain step-for-step.
   This is what forced lr_schedule to the (epoch, group_lr) signature:
   torch anneals BOTH groups to the same eta_min, which a shared
   multiplier cannot express.

3. MultiStepLR (detection-only path, train_3dvlp.py:194:
   milestones LR_DECAY_STEP, gamma 0.1) vs schedules.step_lr.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.train.optimizer import MODULE_LR_GROUPS, label_params, make_optimizer
from vlp3d.train.schedules import cosine_lr, step_lr

BASE_LR, MODULE_LR, WD = 2e-3, 5e-4, 1e-3


@pytest.fixture(scope="module")
def torch():
    return load_reference()


# ---------------------------------------------------------------------------
# 1. group assignment
# ---------------------------------------------------------------------------


def _jointnet_shaped_model(torch):
    """A torch module whose named_parameters() tree mirrors the reference
    JointNet's top-level layout (models/jointnet/jointnet.py:65-110),
    including the nested answer-module names that contain 'lang'
    (models/answer_module/answer_module.py:19,50)."""
    nn = torch.nn

    def leaf():
        return nn.Linear(2, 2)

    class Answer(nn.Module):
        def __init__(self):
            super().__init__()
            self.lang_feat_linear = leaf()  # dormant (init-only)
            self.attflat_lang = leaf()  # dormant
            self.attflat_visual = leaf()  # live path
            self.answer_cls = leaf()

    class Joint(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone_net = leaf()
            self.vgen = leaf()
            self.proposal = leaf()
            self.relation = leaf()
            self.lang = leaf()
            self.positive_match = leaf()
            self.constrast = leaf()  # sic, reference spelling
            self.match = leaf()
            self.caption = leaf()
            self.mlm = leaf()
            self.answer = Answer()

    return Joint()


def test_group_assignment_matches_reference(torch):
    import sys

    sys.path.insert(0, "/root/reference")
    from scripts.utils.script_utils import set_params_lr_dict

    model = _jointnet_shaped_model(torch)
    weight_dict = {
        "lang": {"lr": MODULE_LR},
        "relation": {"lr": MODULE_LR},
        "match": {"lr": MODULE_LR},
        "caption": {"lr": MODULE_LR},
    }
    groups = set_params_lr_dict(
        model, base_lr=BASE_LR, weight_decay=WD, weight_dict=weight_dict
    )

    # Recover name -> effective LR from the oracle's grouping (params are
    # torch tensors; map by identity).
    id_to_name = {id(p): n for n, p in model.named_parameters()}
    oracle_lr = {}
    for g in groups:
        lr = g.get("lr", BASE_LR)
        for p in g["params"]:
            oracle_lr[id_to_name[id(p)]] = lr

    module_prefixes = set()
    base_prefixes = set()
    for name, lr in oracle_lr.items():
        top = name.split(".")[0]
        (module_prefixes if lr == MODULE_LR else base_prefixes).add(
            name.rsplit(".", 1)[0]
        )

    # The oracle's 5e-4 set: the four named modules, plus the substring
    # spillover (positive_match, answer.lang_*). Everything else at 2e-3.
    assert {p.split(".")[0] for p in module_prefixes} == {
        "lang",
        "relation",
        "match",
        "caption",
        "positive_match",
        "answer",
    }
    spill_answer = {p for p in module_prefixes if p.startswith("answer.")}
    assert spill_answer == {"answer.lang_feat_linear", "answer.attflat_lang"}
    assert {p.split(".")[0] for p in base_prefixes} == {
        "backbone_net",
        "vgen",
        "proposal",
        "constrast",
        "mlm",
        "answer",
    }
    live_answer_base = {p for p in base_prefixes if p.startswith("answer.")}
    assert live_answer_base == {"answer.attflat_visual", "answer.answer_cls"}

    # Our labeling: top-level membership. Identical on every LIVE param —
    # the only oracle divergences are positive_match (never called in the
    # reference forward) and the two init-only answer submodules.
    ours = label_params(
        {
            "backbone_net": 0,
            "vgen": 0,
            "proposal": 0,
            "relation": 0,
            "lang": 0,
            "constrast": 0,
            "match": 0,
            "caption": 0,
            "mlm": 0,
            "answer": 0,
        }
    )
    for key, lbl in ours.items():
        want = "module" if key in MODULE_LR_GROUPS else "base"
        assert lbl == want
    # mlm at BASE lr is the non-obvious one; pin it explicitly both sides.
    assert oracle_lr["mlm.weight"] == BASE_LR
    assert ours["mlm"] == "base"


# ---------------------------------------------------------------------------
# 2/3. update-trajectory parity (AdamW + per-group scheduler)
# ---------------------------------------------------------------------------


def _run_torch(torch, scheduler_kind, grads, steps_per_epoch, amsgrad,
               t_max=8, milestones=(2, 4, 6)):
    import sys

    sys.path.insert(0, "/root/reference")
    from scripts.utils.AdamW import AdamW

    nn = torch.nn

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            # names chosen so the substring rule puts w_mod in the
            # 'match' group and w_base in Default
            self.match = nn.Linear(3, 3, bias=False)
            self.backbone_net = nn.Linear(3, 3, bias=False)

    model = M()
    with torch.no_grad():
        model.match.weight.fill_(0.5)
        model.backbone_net.weight.fill_(0.5)

    from scripts.utils.script_utils import set_params_lr_dict

    params = set_params_lr_dict(
        model,
        base_lr=BASE_LR,
        weight_decay=WD,
        weight_dict={"match": {"lr": MODULE_LR}},
    )
    opt = AdamW(params, lr=BASE_LR, weight_decay=WD, amsgrad=amsgrad)
    if scheduler_kind == "cosine":
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=t_max, eta_min=1e-5
        )
    else:
        sched = torch.optim.lr_scheduler.MultiStepLR(
            opt, milestones=list(milestones), gamma=0.1
        )

    traj = []
    for step, g in enumerate(grads):
        gt = torch.from_numpy(g)
        model.match.weight.grad = gt.clone()
        model.backbone_net.weight.grad = gt.clone()
        opt.step()
        if (step + 1) % steps_per_epoch == 0:
            sched.step()  # per-epoch, as solver_3dvlp.py's epoch loop does
        traj.append(
            (
                model.match.weight.detach().numpy().copy(),
                model.backbone_net.weight.detach().numpy().copy(),
            )
        )
    return traj


def _run_ours(scheduler_kind, grads, steps_per_epoch, amsgrad,
              t_max=8, milestones=(2, 4, 6)):
    if scheduler_kind == "cosine":
        schedule = lambda e, lr0: cosine_lr(e, lr0, t_max, 1e-5)  # noqa: E731
    else:
        schedule = lambda e, lr0: step_lr(e, lr0, milestones, 0.1)  # noqa: E731
    opt = make_optimizer(
        base_lr=BASE_LR,
        module_lr=MODULE_LR,
        weight_decay=WD,
        lr_schedule=schedule,
        steps_per_epoch=steps_per_epoch,
        amsgrad=amsgrad,
    )
    params = {
        "match": jnp.full((3, 3), 0.5, jnp.float32),
        "backbone_net": jnp.full((3, 3), 0.5, jnp.float32),
    }
    state = opt.init(params)
    traj = []
    for g in grads:
        gj = jnp.asarray(g)
        updates, state = opt.update(
            {"match": gj, "backbone_net": gj}, state, params
        )
        params = {k: params[k] + updates[k] for k in params}
        traj.append((np.asarray(params["match"]),
                     np.asarray(params["backbone_net"])))
    return traj


@pytest.mark.parametrize("scheduler_kind", ["cosine", "step"])
@pytest.mark.parametrize("amsgrad", [False, True])
def test_adamw_schedule_trajectory_parity(torch, scheduler_kind, amsgrad):
    """8 epochs x 3 steps: per-group LRs must track torch exactly.

    The torch scheduler is stepped once per epoch; our optax schedule
    derives the epoch from the step counter. Milestones/T_max are small
    so the run crosses every regime the reference trains in: the full
    cosine descent to eta_min and all three MultiStepLR decays. (Beyond
    T_max torch's cosine oscillates back up while ours clamps at
    eta_min; the reference never trains past T_max = min(epochs, 200),
    so that region is intentionally out of scope.)"""
    rng = np.random.default_rng(3)
    steps_per_epoch = 3
    grads = [
        rng.normal(0, 1, (3, 3)).astype(np.float32) for _ in range(24)
    ]
    ref = _run_torch(torch, scheduler_kind, grads, steps_per_epoch, amsgrad)
    ours = _run_ours(scheduler_kind, grads, steps_per_epoch, amsgrad)
    for step, ((rm, rb), (om, ob)) in enumerate(zip(ref, ours)):
        # torch Linear stores weight as (out, in); update math is
        # elementwise so orientation is irrelevant for this parity check
        np.testing.assert_allclose(om, rm, rtol=0, atol=2e-6,
                                   err_msg=f"module group, step {step}")
        np.testing.assert_allclose(ob, rb, rtol=0, atol=2e-6,
                                   err_msg=f"base group, step {step}")


def test_vqa_adam_clip_recipe_trajectory(torch):
    """The VQA paths' optimizer: plain torch Adam (COUPLED L2), one param
    group, clip_grad_value_(1.0) before the step, MultiStepLR([100, 200],
    0.2) stepped per epoch (scripts/joint_scripts/train_qa.py:145-159 +
    lib/vqa/solver.py:210-216, 330-340) vs make_optimizer(optim_name=
    'adam', single_group=True, clip_grad_value=1.0)."""
    lr, wd = 5e-4, 1e-5
    rng = np.random.default_rng(9)
    steps_per_epoch = 2
    # grads straddle the clip bound so clipping actually bites
    grads = [rng.normal(0, 2, (4, 4)).astype(np.float32) for _ in range(12)]

    w = torch.nn.Parameter(torch.full((4, 4), 0.3))
    opt = torch.optim.Adam([w], lr=lr, weight_decay=wd)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[2, 4], gamma=0.2)
    ref_traj = []
    for step, g in enumerate(grads):
        w.grad = torch.from_numpy(g).clone()
        torch.nn.utils.clip_grad_value_([w], clip_value=1.0)
        opt.step()
        opt.zero_grad()
        if (step + 1) % steps_per_epoch == 0:
            sched.step()
        ref_traj.append(w.detach().numpy().copy())

    ours = make_optimizer(
        base_lr=lr, weight_decay=wd,
        lr_schedule=lambda e, lr0: step_lr(e, lr0, (2, 4), 0.2),
        steps_per_epoch=steps_per_epoch,
        optim_name="adam", single_group=True, clip_grad_value=1.0,
    )
    params = jnp.full((4, 4), 0.3, jnp.float32)
    state = ours.init(params)
    for step, g in enumerate(grads):
        updates, state = ours.update(jnp.asarray(g), state, params)
        params = params + updates
        np.testing.assert_allclose(
            np.asarray(params), ref_traj[step], rtol=0, atol=2e-6,
            err_msg=f"step {step}",
        )
