"""DIRECT parity for the final-eval unique/multiple x others breakdown:
utils/utils_fn.py:165-291 (final_eval_fn — print-only, so the oracle's
stdout is parsed) vs vlp3d/eval/grounding.final_eval_breakdown.
"""

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.eval.grounding import final_eval_breakdown


@pytest.fixture(scope="module")
def torch():
    return load_reference()


KEYMAP = {
    ("unique", "not_in_others"): "unique_wo_others",
    ("unique", "in_others"): "unique_w_others",
    ("unique", "overall"): "unique",
    ("multiple", "not_in_others"): "multiple_wo_others",
    ("multiple", "in_others"): "multiple_w_others",
    ("multiple", "overall"): "multiple",
    ("overall", "not_in_others"): "overall_wo_others",
    ("overall", "in_others"): "overall_w_others",
    ("overall", "overall"): "overall",
}


@pytest.mark.parametrize("case", ["mixed", "no_others", "all_multiple"])
def test_final_eval_breakdown_matches(torch, capsys, case):
    from utils.utils_fn import final_eval_fn

    rng = np.random.default_rng({"mixed": 0, "no_others": 1,
                                 "all_multiple": 2}[case])
    n = 97
    ious = rng.uniform(0, 1, n)
    multiple = (rng.random(n) < 0.6).astype(np.int64)
    others = (rng.random(n) < 0.3).astype(np.int64)
    if case == "no_others":
        others[:] = 0
    if case == "all_multiple":
        multiple[:] = 1
    ref_acc = rng.uniform(0, 1, n)
    lang_acc = rng.uniform(0, 1, n)

    final_eval_fn(
        np.array([multiple]), np.array([others]), np.array([ref_acc]),
        np.array([ious]), np.array([lang_acc]),
    )
    printed = capsys.readouterr().out
    oracle = {}
    for line in printed.splitlines():
        if line.count(" | ") == 2 and ":" in line:
            k, k_o, rest = line.split(" | ")
            metric, val = rest.split(": ")
            oracle[(k.strip(), k_o.strip(), metric.strip())] = float(val)

    ours = final_eval_breakdown(ious, multiple, others)
    checked = 0
    for (k, k_o), prefix in KEYMAP.items():
        for thr in ("0.25", "0.5"):
            key = (k, k_o, f"acc@{thr}iou")
            if key not in oracle:
                continue  # stats lines vs scores lines share the format
            np.testing.assert_allclose(
                ours[f"{prefix}_acc@{thr}"], oracle[key], atol=1e-9,
                err_msg=str(key),
            )
            checked += 1
    assert checked == 18, f"only matched {checked} oracle series"
