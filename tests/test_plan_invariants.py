"""Structural invariants the physical-plan optimizations rely on.

The engine rebuilds `labels` as map_from_entries(sig) after every hash
aggregation instead of carrying the map through the aggregation buffer
(struct/map buffers would demote group-bys to SortAggregate). That is only
sound while every operator output keeps labels == map_from_entries(sig);
these tests pin the invariant and the resulting plan shape so a future
operator that breaks it fails loudly here rather than silently mislabeling
series.
"""

from __future__ import annotations

import pytest

from metric_store_release_spark import EngineConfig, PromQLEngine
from metric_store_release_spark.engine.evaluator import (
    EvalContext,
    Evaluator,
    VectorResult,
)
from metric_store_release_spark.promql.parser import parse
from metric_store_release_spark.sources import corpus

MIN = 60_000

SERIES = [
    'http_requests{job="api-server", instance="0", group="production"} 0+10x10',
    'http_requests{job="api-server", instance="1", group="canary"} 0+20x10',
    'http_requests{job="app-server", instance="0", group="canary"} 0+30x10',
    'foo{job="api-server"} 0+40x10',
]

QUERIES = [
    'http_requests{job="api-server"}',            # instant selector
    "rate(http_requests[10m])",                   # range function
    "sum by (job) (http_requests)",               # aggregation (by)
    "sum without (instance) (http_requests)",     # aggregation (without)
    "count_values('v', http_requests)",           # label-injecting agg
    'label_replace(http_requests, "dst", "$1", "job", "(.*)-server")',
    "abs(http_requests)",                         # scalar function (name drop)
    "last_over_time(http_requests[10m])",         # keeps __name__
]


@pytest.fixture(scope="module")
def samples(spark):
    df = corpus.load(spark, 5 * MIN, SERIES)
    df.cache().count()
    return df


@pytest.mark.parametrize("query", QUERIES)
def test_labels_match_sig(spark, samples, query):
    ctx = EvalContext(
        spark=spark,
        samples=samples,
        start_ms=10 * MIN,
        end_ms=40 * MIN,
        step_ms=10 * MIN,
        lookback_ms=6 * MIN,
        query_start_ms=10 * MIN,
        query_end_ms=40 * MIN,
    )
    res = Evaluator(ctx).eval(parse(query))
    assert isinstance(res, VectorResult)
    rows = res.df.select("labels", "sig").collect()
    assert rows, f"no output rows for {query!r}"
    for r in rows:
        assert dict(r["labels"]) == {e["key"]: e["value"] for e in r["sig"]}, (
            f"labels/sig diverged for {query!r}: {r}"
        )


def test_explode_labels_projection(spark, samples):
    from metric_store_release_spark.engine.engine import explode_labels

    eng = PromQLEngine(spark, EngineConfig(lookback_ms=6 * MIN))
    out = eng.query_range(
        samples, 'http_requests{group="canary"}', 10 * MIN, 10 * MIN, 10 * MIN
    )
    flat = explode_labels(out, ["job", "instance"], keep_name=True)
    assert flat.columns == ["t", "name", "value", "job", "instance"]
    rows = {(r["job"], r["instance"]) for r in flat.collect()}
    assert rows == {("api-server", "1"), ("app-server", "0")}
    assert {r["name"] for r in flat.collect()} == {"http_requests"}


@pytest.mark.parametrize(
    "query",
    ['http_requests{job="api-server"}', "rate(http_requests[10m])",
     "sum by (job) (http_requests)"],
)
def test_no_sort_aggregate_in_plan(spark, samples, query):
    eng = PromQLEngine(spark, EngineConfig(lookback_ms=6 * MIN))
    out = eng.query_range(samples, query, 10 * MIN, 40 * MIN, 10 * MIN)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan, f"SortAggregate regressed for {query!r}"
