"""Plan-budget regression guard: every driver-contract query's physical
plan must keep its committed shuffle/scan/Python/nested-loop fingerprint
(tests/plan_budget.json).  Results staying correct is not enough — a
query that silently gains an Exchange or drops to a Python eval path is
a 100 TB regression.  Deliberate plan changes: rerun
``python tests/regen_plan_budget.py`` and review the JSON diff."""
import json
import os

import pytest
import regen_plan_budget as regen


# the 94-query sweep takes ~30 s; the fast tier keeps the targeted plan
# assertions (tests/test_plans.py), this full-coverage recompute runs in
# the oracle tier (part of the complete gate, see pytest.ini)
@pytest.mark.oracle
def test_plans_match_committed_budget(spark):
    assert os.path.exists(regen.BUDGET_PATH), (
        "tests/plan_budget.json missing — run python tests/regen_plan_budget.py"
    )
    with open(regen.BUDGET_PATH) as f:
        budget = json.load(f)
    got = regen.compute(spark)
    assert set(got) == set(budget), (
        f"query set drifted: new={sorted(set(got) - set(budget))} "
        f"gone={sorted(set(budget) - set(got))} — regenerate the budget"
    )
    drift = {
        name: {"want": budget[name], "got": got[name]}
        for name in got
        if got[name] != budget[name]
    }
    assert not drift, f"plan fingerprints drifted: {json.dumps(drift, indent=2)}"
