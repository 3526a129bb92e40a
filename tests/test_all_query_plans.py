"""Global driver-contract guard: every declared query's plan BUILDS
against the sf0.001 tables (catching analysis errors before the driver
gate does) and contains no CartesianProduct — the one join shape that is
never acceptable at warehouse scale. (BroadcastNestedLoopJoin appears
legitimately for 1-row stats cross-joins, so it is not banned here; the
per-operator invariant tests pin those cases individually.)
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = list(entry_mod.queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_plan_builds_without_cartesian(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


def test_every_query_has_oracle():
    assert set(entry_mod.oracle_sql()) == set(entry_mod.queries())
