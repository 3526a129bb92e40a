"""percentiles_distributed == buffered F.percentile, exactly."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.events import percentiles_distributed


def _both(spark, rows, qs=(0.5, 0.9, 0.99)):
    df = spark.createDataFrame(rows, ["event_type", "value"])
    dist = {
        r["event_type"]: [r[f"p{int(q * 100)}"] for q in qs]
        for r in percentiles_distributed(df, qs=qs).collect()
    }
    buf = {
        r["event_type"]: [r[f"p{int(q * 100)}"] for q in qs]
        for r in df.groupBy("event_type")
        .agg(
            *[
                F.round(F.percentile("value", F.lit(q)), 6).alias(
                    f"p{int(q * 100)}"
                )
                for q in qs
            ]
        )
        .collect()
    }
    return dist, buf


def test_matches_buffered_percentile_random(spark):
    rng = random.Random(7)
    rows = [
        (f"t{rng.randrange(4)}", round(rng.uniform(0, 50), 2))
        for _ in range(500)
    ]
    dist, buf = _both(spark, rows)
    assert dist == buf


def test_matches_on_duplicates_and_singletons(spark):
    rows = (
        [("dup", 1.0)] * 10
        + [("dup", 2.0)] * 3
        + [("one", 42.5)]
        + [("two", 1.0), ("two", 2.0)]
    )
    dist, buf = _both(spark, rows)
    assert dist == buf


def test_integral_rank_no_interpolation(spark):
    # 5 values, q=0.5 -> rank0 = 2.0 exactly: frac 0, result is the
    # middle value with no v_hi contribution
    rows = [("k", float(v)) for v in (10, 20, 30, 40, 50)]
    dist, buf = _both(spark, rows, qs=(0.5, 0.25))
    assert dist == buf
    assert dist["k"][0] == 30.0


def test_dist_plan_aggregates_before_window(spark):
    """The skew-safety claim lives in the plan: the Window must consume
    the (key, value)->count hash aggregate (bounded distribution table),
    never the raw scan."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["events_latency_pctl_dist"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # window input side contains the partial+final count aggregation
    win_pos = plan.index("Window")
    below = plan[win_pos:]
    assert "HashAggregate" in below, plan
    # and the buffered percentile aggregate appears nowhere
    assert "percentile" not in plan.lower(), plan
