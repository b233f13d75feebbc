"""Dryrun harness guarantees (VERDICT r04 item 1): the soft wall budget
degrades to SKIP verdicts with the summary tail still printed, and the
parent streams/forwards whatever the child produced — evidence can never
be erased by a budget overrun."""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zero_budget_skips_every_section_but_prints_the_tail():
    env = dict(os.environ)
    env["VLP3D_DRYRUN_BUDGET_S"] = "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "__graft_entry__.py"), "8"],
        capture_output=True, text=True, timeout=600, env=env, cwd=_REPO,
    )
    out = proc.stdout
    # SKIPs are not failures: the driver artifact stays ok and records
    # WHY each section did not run
    assert proc.returncode == 0, (proc.returncode, out[-2000:],
                                  proc.stderr[-2000:])
    # every section verdict line is present in the summary tail
    for section in ("sp", "pp", "dp_tp", "remat", "zero1",
                    "composed_3d", "dcn"):
        assert f"section {section}: SKIP(budget)" in out, (section, out)
    assert "0 failed" in out
