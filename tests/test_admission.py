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
    # timeout disabled: on a cold JVM the first action can exceed the 10 s
    # default, and the timeout would then mask the limit error we assert on
    tiny = PromQLEngine(spark, EngineConfig(max_samples=10, timeout_ms=None))
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


def test_max_samples_counts_range_windows(spark, samples, tmp_path):
    # a range selector fans each sample onto range/step grid steps; the
    # bound must see that fan-out, not just the raw row count (in-memory
    # sources have no metadata bound — use a parquet store, the real case)
    from metric_store_release_spark.engine.admission import static_sample_bound
    from metric_store_release_spark.promql import parse

    path = str(tmp_path / "adm_bound")
    samples.write.mode("overwrite").parquet(path)
    store = spark.read.parquet(path)
    inst = static_sample_bound(store, parse("http"), 0, 50 * MIN, MIN, 5 * MIN)
    rng = static_sample_bound(
        store, parse("rate(http[10m])"), 0, 50 * MIN, MIN, 5 * MIN
    )
    assert rng > inst > 0


def test_static_bound_from_parquet_footers_no_spark_job(spark, samples, tmp_path):
    """The parquet-backed bound must come from footer metadata alone —
    asserted by running it inside a job group that stays empty."""
    from metric_store_release_spark.engine.admission import (
        _footer_rows_cache,
        static_sample_bound,
    )
    from metric_store_release_spark.promql import parse

    path = str(tmp_path / "adm_store")
    samples.write.mode("overwrite").parquet(path)
    store = spark.read.parquet(path)
    _footer_rows_cache.clear()

    sc = spark.sparkContext
    group = "admission-footer-test"
    sc.setJobGroup(group, "footer bound", interruptOnCancel=False)
    try:
        bound = static_sample_bound(
            store, parse("rate(http[10m])"), 0, 50 * MIN, MIN, 5 * MIN
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert bound is not None and bound > 0
    assert sc.statusTracker().getJobIdsForGroup(group) == [], (
        "static_sample_bound launched a Spark job — it must be metadata-only"
    )
    # the bound really is an upper bound on the exact per-step fan-out
    exact = (
        PromQLEngine(spark, EngineConfig(max_samples=None))
        .query_range(store, "rate(http[10m])", 0, 50 * MIN, MIN)
        .count()
    )
    assert bound >= exact


def test_static_bound_footer_cache_invalidates_on_append(spark, samples, tmp_path):
    """Appending files to the store must produce a fresh (larger) bound —
    the cache key includes the file listing, not just the path."""
    from metric_store_release_spark.engine.admission import static_sample_bound
    from metric_store_release_spark.promql import parse

    path = str(tmp_path / "adm_grow")
    samples.write.mode("overwrite").parquet(path)
    before = static_sample_bound(
        spark.read.parquet(path), parse("http"), 0, 50 * MIN, MIN, 5 * MIN
    )
    samples.write.mode("append").parquet(path)
    after = static_sample_bound(
        spark.read.parquet(path), parse("http"), 0, 50 * MIN, MIN, 5 * MIN
    )
    assert before is not None and after is not None and after > before


def test_static_bound_at_pinned_window(spark, tmp_path):
    """@-pinned selectors must bound over the window around the RESOLVED @
    time: dense data near T with a query range elsewhere may NOT undercount
    (the ADVICE bypass scenario)."""
    from metric_store_release_spark.engine.admission import static_sample_bound
    from metric_store_release_spark.promql import parse

    # dense series around t=1000min, nothing in the queried [0, 10min] range
    dense = corpus.load(
        spark, MIN, ['pin{job="a"} 0+1x60']
    ).withColumn("ts", F.col("ts") + F.lit(1000 * MIN))
    path = str(tmp_path / "adm_at")
    dense.write.mode("overwrite").parquet(path)
    store = spark.read.parquet(path)
    t_pin = (1000 + 30) * MIN  # inside the dense region
    bound = static_sample_bound(
        store, parse(f"pin @ {t_pin // 1000}"), 0, 10 * MIN, MIN, 5 * MIN
    )
    # 11 steps × the ~5min lookback window of dense data at the pin: must
    # count the pinned window's rows, not the (empty) query range
    assert bound is not None and bound > 0


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


def test_active_query_log_mid_flight_and_clean_exit(spark, tmp_path):
    # ActiveQueryTracker file analog: the in-flight entry is visible on
    # disk while the query runs and gone after a clean completion
    import threading

    from metric_store_release_spark.engine.admission import ActiveQueryLog

    log_path = str(tmp_path / "active.log")
    eng = PromQLEngine(
        spark, EngineConfig(active_query_log_path=log_path, timeout_ms=None)
    )

    @F.udf("long")
    def slowish(x):
        time.sleep(1.0)
        return x

    df = spark.range(2, numPartitions=1).select(slowish(F.col("id")).alias("t"))
    seen: list[dict] = []
    t = threading.Thread(
        target=lambda: eng.execute(df, query="avg_over_time(cpu[30m])")
    )
    t.start()
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and not seen:
        seen = ActiveQueryLog(log_path).leftover()
        time.sleep(0.05)
    t.join(60)
    assert seen and seen[0]["query"] == "avg_over_time(cpu[30m])"
    assert ActiveQueryLog(log_path).leftover() == []


def test_active_query_log_survives_crash(tmp_path):
    # kill a driver process mid-query: the leftover log line identifies the
    # query that was running (the reference replays this file on restart to
    # report queries that crashed the instance)
    import os
    import subprocess
    import sys
    import textwrap

    from metric_store_release_spark.engine.admission import ActiveQueryLog

    log_path = str(tmp_path / "active.log")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "crasher.py"
    script.write_text(
        textwrap.dedent(
            f"""
            import sys, time
            sys.path.insert(0, {repo!r})
            from pyspark.sql import SparkSession
            from pyspark.sql import functions as F
            from metric_store_release_spark import EngineConfig, PromQLEngine

            spark = (
                SparkSession.builder.master("local[2]")
                .config("spark.ui.enabled", "false")
                .getOrCreate()
            )
            eng = PromQLEngine(
                spark,
                EngineConfig(active_query_log_path={log_path!r}, timeout_ms=None),
            )

            @F.udf("long")
            def slow(x):
                time.sleep(30)
                return x

            df = spark.range(4).select(slow(F.col("id")).alias("t"))
            eng.execute(df, query='sum(rate(http[5m]))')
            """
        )
    )
    proc = subprocess.Popen(
        [sys.executable, str(script)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.monotonic() + 180
        leftover: list[dict] = []
        while time.monotonic() < deadline and not leftover:
            leftover = ActiveQueryLog(log_path).leftover()
            if proc.poll() is not None:
                raise AssertionError("crasher exited before logging its query")
            time.sleep(0.2)
        assert leftover, "query never appeared in the active log"
    finally:
        proc.kill()
        proc.wait()
    # the process died mid-query -> the entry survives as forensics
    leftover = ActiveQueryLog(log_path).leftover()
    assert leftover and leftover[0]["query"] == "sum(rate(http[5m]))"
