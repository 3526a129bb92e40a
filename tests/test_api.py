"""Prometheus v1 API envelopes + labels/series endpoints + blackbox."""

from __future__ import annotations

import pytest

from metric_store_release_spark import api
from metric_store_release_spark.sources import corpus

MIN = 60_000


@pytest.fixture(scope="module")
def samples(spark):
    df = corpus.load(
        spark,
        5 * MIN,
        [
            'http_requests{job="api", instance="0"} 0+10x10',
            'http_requests{job="api", instance="1"} 0+20x10',
            'cpu{host="a"} 1 2 3',
        ],
    )
    df.cache().count()
    return df


def test_instant_query_envelope(engine, samples):
    out = api.query(engine, samples, "sum by (job) (http_requests)", 10 * MIN)
    assert out["status"] == "success"
    assert out["data"]["resultType"] == "vector"
    assert out["data"]["result"] == [
        {"metric": {"job": "api"}, "value": [600.0, "60"]}
    ]


def test_range_query_envelope(engine, samples):
    out = api.query_range(
        engine, samples, 'http_requests{instance="0"}', 0, 10 * MIN, 5 * MIN
    )
    assert out["data"]["resultType"] == "matrix"
    res = out["data"]["result"]
    assert len(res) == 1
    assert res[0]["metric"]["__name__"] == "http_requests"
    assert res[0]["values"] == [[0.0, "0"], [300.0, "10"], [600.0, "20"]]


def test_float_formatting(engine, samples):
    out = api.query(engine, samples, "http_requests / 3", 5 * MIN)
    vals = {r["metric"]["instance"]: r["value"][1] for r in out["data"]["result"]}
    assert vals["0"] == "3.3333333333333335"
    assert vals["1"] == "6.666666666666667"


def test_labels_endpoints(samples):
    out = api.labels(samples)
    assert out["data"] == ["__name__", "host", "instance", "job"]
    out = api.label_values(samples, "__name__")
    assert out["data"] == ["cpu", "http_requests"]
    out = api.label_values(samples, "instance")
    assert out["data"] == ["0", "1"]


def test_series_endpoint(samples):
    out = api.series(samples, ['http_requests{instance="0"}', "cpu"])
    assert out["data"] == [
        {"__name__": "cpu", "host": "a"},
        {"__name__": "http_requests", "instance": "0", "job": "api"},
    ]


def test_blackbox_reliability(engine, spark):
    from metric_store_release_spark.blackbox import performance_probe, reliability

    # canary at 1 pt/min for 100 minutes
    df = corpus.load(spark, MIN, ["canary 0+1x100"])
    r = reliability(
        engine,
        df,
        "canary",
        at_ms=60 * MIN,
        window_ms=10 * MIN,
        lag_ms=20 * MIN,
        emission_interval_ms=MIN,
    )
    # closed window [30m,40m] holds 11 samples against 10 expected
    assert r == pytest.approx(1.1)
    latency, value = performance_probe(engine, df, "canary", 100 * MIN, window="1h")
    assert value == 61.0
    assert latency > 0
