"""Admission limits — MaxSamples cap, query timeout, concurrency gate
(metric_store.go:295-303, vendor promql/engine.go:576-648)."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from metric_store_release_spark import (
    EngineConfig,
    PromQLEngine,
    QueryLimitError,
    QueryTimeoutError,
)
from metric_store_release_spark.sources import corpus

MIN = 60_000


@pytest.fixture(scope="module")
def samples(spark):
    return corpus.load(
        spark,
        MIN,
        [f'http{{job="{j}"}} 0+10x50' for j in range(4)],
    ).cache()


def test_max_samples_guard(spark, samples):
    tiny = PromQLEngine(spark, EngineConfig(max_samples=10))
    df = tiny.query_range(samples, "http", 0, 50 * MIN, MIN)
    # execute() surfaces the in-plan abort as the typed error
    with pytest.raises(QueryLimitError, match="MaxSamples"):
        tiny.execute(df, timeout_ms=None)
    # a direct action aborts too (the guard rides the plan itself)
    with pytest.raises(Exception, match="MaxSamples"):
        df.count()
    # raising the cap admits the same query
    ok = PromQLEngine(spark, EngineConfig(max_samples=10_000_000))
    assert ok.query_range(samples, "http", 0, 50 * MIN, MIN).count() > 0


def test_max_samples_counts_range_windows(spark, samples):
    # a range selector fans each sample onto range/step grid steps; the
    # estimate must see that fan-out, not just the raw row count
    from metric_store_release_spark.engine.admission import estimate_query_samples
    from metric_store_release_spark.promql import parse

    inst = estimate_query_samples(samples, parse("http"), 0, 50 * MIN, MIN, 5 * MIN)
    rng = estimate_query_samples(
        samples, parse("rate(http[10m])"), 0, 50 * MIN, MIN, 5 * MIN
    )
    assert rng > inst > 0


def test_max_samples_disabled(spark, samples):
    off = PromQLEngine(spark, EngineConfig(max_samples=None))
    assert off.query_range(samples, "http", 0, 50 * MIN, MIN).count() > 0


def test_timeout_cancels_long_query(spark):
    eng = PromQLEngine(spark, EngineConfig(timeout_ms=500))

    @F.udf("long")
    def slow(x):
        time.sleep(0.5)
        return x

    df = spark.range(64).select(slow(F.col("id")).alias("id"))
    with pytest.raises(QueryTimeoutError, match="timeout"):
        eng.execute(df)
    # let the cancelled tasks drain, then a fast plan completes fine
    time.sleep(2)
    assert len(eng.execute(spark.range(3).toDF("t"), timeout_ms=60_000)) == 3


def test_concurrency_gate(spark):
    eng = PromQLEngine(spark, EngineConfig(max_concurrent_queries=1))
    assert eng._query_gate.acquire(blocking=False)
    try:
        with pytest.raises(QueryLimitError, match="concurrent"):
            eng.execute(spark.range(1))
    finally:
        eng._query_gate.release()
    # released → executes again
    assert len(eng.execute(spark.range(1))) == 1
