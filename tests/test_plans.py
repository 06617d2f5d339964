"""Physical-plan regression tests: pushdown, pruning, broadcast, top-k
(tools/audit_plans.py CHECKS, wired into pytest so a plan regression fails CI)."""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from audit_plans import CHECKS, plan_of  # noqa: E402

from kgspark.entry_queries import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_plan_properties(spark, name):
    plan = plan_of(QUERIES[name](spark, SF_DIR))
    for pattern, why in CHECKS[name]:
        assert re.search(pattern, plan), f"{name}: missing {why} (pattern {pattern})\n{plan[:3000]}"
