"""Nozzle conversion + timer rollup semantics (FIXTURES.md §F5 goldens)."""

from __future__ import annotations

import tempfile

import pytest

from pyspark.sql import functions as F

from metric_store_release_spark.streaming.nozzle import (
    ENVELOPE_SCHEMA,
    counters_to_points,
    envelopes_to_points,
    gauges_to_points,
)
from metric_store_release_spark.streaming.rollup import (
    rollup_counters,
    rollup_histograms,
)

NS = 1_000_000_000


def env_row(
    ts_s: float,
    typ: str,
    source_id: str = "gorouter",
    name: str | None = None,
    total: float | None = None,
    gauges: dict | None = None,
    start: int | None = None,
    stop: int | None = None,
    tags: dict | None = None,
):
    return (
        int(ts_s * NS),
        source_id,
        typ,
        name,
        total,
        gauges,
        start,
        stop,
        tags or {},
    )


@pytest.fixture()
def timer_envelopes(spark):
    rows = []
    # window [0,10s): three timers for app A (status 200), one for B (500)
    for i, dur_ms in enumerate([3, 30, 300]):
        rows.append(
            env_row(
                1 + i,
                "timer",
                name="http",
                start=0,
                stop=dur_ms * 1_000_000,
                tags={"status_code": "200", "app_id": "A"},
            )
        )
    rows.append(
        env_row(
            5, "timer", name="http", start=0, stop=2 * NS,
            tags={"status_code": "500", "app_id": "B"},
        )
    )
    # a client-peer timer must be ignored (nozzle.go:246-248)
    rows.append(
        env_row(
            6, "timer", name="http", start=0, stop=NS,
            tags={"status_code": "200", "app_id": "A", "peer_type": "client"},
        )
    )
    # next window [10,20s)
    rows.append(
        env_row(
            12, "timer", name="http", start=0, stop=50_000_000,
            tags={"status_code": "200", "app_id": "A"},
        )
    )
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)


def test_rollup_counter(spark, timer_envelopes):
    out = rollup_counters(timer_envelopes).collect()
    got = {
        (r["ts"], r["labels"]["app_id"], r["labels"]["status_code"]): r["value"]
        for r in out
    }
    # cumulative across windows (counter.go keeps running totals)
    assert got == {
        (10_000, "A", "200"): 3.0,
        (10_000, "B", "500"): 1.0,
        (20_000, "A", "200"): 4.0,
    }
    names = {r["name"] for r in out}
    assert names == {"http_total"}
    assert all(r["labels"]["source_id"] == "gorouter" for r in out)
    assert all(r["labels"]["node_index"] == "0" for r in out)


def test_rollup_histogram(spark, timer_envelopes):
    out = rollup_histograms(timer_envelopes).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["name"], []).append(r)
    # grouping excludes status_code → A and B both under their app_id only
    counts = {
        (r["ts"], r["labels"]["app_id"]): r["value"]
        for r in by_name["http_duration_seconds_count"]
    }
    assert counts == {(10_000, "A"): 3.0, (10_000, "B"): 1.0, (20_000, "A"): 4.0}
    sums = {
        (r["ts"], r["labels"]["app_id"]): round(r["value"], 6)
        for r in by_name["http_duration_seconds_sum"]
    }
    assert sums == {(10_000, "A"): 0.333, (10_000, "B"): 2.0, (20_000, "A"): 0.383}
    # cumulative buckets for window-1 app A: durations 3ms, 30ms, 300ms
    a1 = {
        r["labels"]["le"]: r["value"]
        for r in by_name["http_duration_seconds_bucket"]
        if r["ts"] == 10_000 and r["labels"]["app_id"] == "A"
    }
    assert a1["0.005"] == 1.0
    assert a1["0.05"] == 2.0
    assert a1["0.5"] == 3.0
    assert a1["+Inf"] == 3.0
    # monotone cumulative
    order = ["0.005", "0.01", "0.025", "0.05", "0.1", "0.25", "0.5", "1.0", "2.5", "5.0", "10.0", "+Inf"]
    vals = [a1[k] for k in order]
    assert vals == sorted(vals)
    # status_code is not a histogram label
    assert all(
        "status_code" not in r["labels"]
        for r in by_name["http_duration_seconds_bucket"]
    )


def test_histogram_quantile_over_rollup(spark, engine, timer_envelopes):
    """End-to-end: rollup output → engine histogram_quantile (FIXTURES F4)."""
    pts = rollup_histograms(timer_envelopes)
    samples = pts.withColumn("stale", F.lit(False))
    out = engine.query_instant(
        samples,
        'histogram_quantile(0.5, http_duration_seconds_bucket{app_id="A"})',
        10_000,
    ).collect()
    # 3 observations in buckets ≤0.005 / ≤0.05 / ≤0.5 → median interpolates
    # inside the (0.025, 0.05] bucket: rank 1.5 → 0.025 + 0.025*(0.5/1)
    assert len(out) == 1
    assert out[0]["value"] == pytest.approx(0.0375)


def test_gauge_and_counter_conversion(spark):
    rows = [
        env_row(
            1,
            "gauge",
            source_id="app-1",
            gauges={
                "cpu": {"unit": "percent", "value": 12.5},
                "memory": {"unit": "bytes", "value": float("nan")},  # rejected
            },
            tags={"deployment": "cf"},
        ),
        env_row(
            2, "counter", source_id="app-1", name="2bad.name", total=42.0,
            tags={},
        ),
    ]
    env = spark.createDataFrame(rows, ENVELOPE_SCHEMA)
    pts = envelopes_to_points(env).collect()
    by_name = {r["name"]: r for r in pts}
    assert set(by_name) == {"cpu", "_2bad_name"}  # sanitized + NaN dropped
    cpu = by_name["cpu"]
    assert cpu["value"] == 12.5
    assert cpu["labels"]["unit"] == "percent"
    assert cpu["labels"]["source_id"] == "app-1"
    assert cpu["labels"]["deployment"] == "cf"
    assert cpu["ts"] == 1000
    assert by_name["_2bad_name"]["value"] == 42.0


def test_rollup_streaming_availablenow(spark, timer_envelopes):
    """The same rollup code runs under Structured Streaming."""
    import os

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        out = os.path.join(tmp, "out")
        ckpt = os.path.join(tmp, "ckpt")
        timer_envelopes.write.parquet(src)
        stream = spark.readStream.schema(ENVELOPE_SCHEMA).parquet(src)
        from metric_store_release_spark.streaming.rollup import rollup_stream

        q = rollup_stream(stream, out, ckpt)
        q.awaitTermination(120)
        from metric_store_release_spark.sources.storage import read_samples

        got = read_samples(spark, out)
        counters = got.filter(F.col("name") == "http_total").collect()
        assert {(r["ts"], r["labels"]["app_id"]): r["value"] for r in counters} == {
            (10_000, "A"): 3.0,
            (10_000, "B"): 1.0,
            (20_000, "A"): 4.0,
        }
