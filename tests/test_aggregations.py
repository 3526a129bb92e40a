"""Aggregation semantics vs vendor promql/testdata/aggregators.test goldens."""

from __future__ import annotations

import math

import pytest

from metric_store_release_spark.sources import corpus
from tests.conftest import rows_to_dict
from tests.test_selectors import HTTP_REQUESTS, MIN


@pytest.fixture(scope="module")
def samples(spark):
    df = corpus.load(spark, 5 * MIN, HTTP_REQUESTS)
    df.cache().count()
    return df


def test_sum_by_group(engine, samples):
    # aggregators.test:16-18 golden
    df = engine.query_instant(
        samples, 'sum by (group) (http_requests{job="api-server"})', 50 * MIN
    )
    got = rows_to_dict(df, ["group"])
    assert got == {(50 * MIN, "canary"): 700.0, (50 * MIN, "production"): 300.0}


def test_sum_without(engine, samples):
    df = engine.query_instant(
        samples, 'sum without (instance) (http_requests{job="api-server"})', 50 * MIN
    )
    got = rows_to_dict(df, ["job", "group"])
    assert got == {
        (50 * MIN, "api-server", "canary"): 700.0,
        (50 * MIN, "api-server", "production"): 300.0,
    }


def test_avg_min_max_count(engine, samples):
    q = 'avg by (job) (http_requests)'
    got = rows_to_dict(engine.query_instant(samples, q, 50 * MIN), ["job"])
    assert got == {(50 * MIN, "api-server"): 250.0, (50 * MIN, "app-server"): 650.0}

    q = 'min by (job) (http_requests)'
    got = rows_to_dict(engine.query_instant(samples, q, 50 * MIN), ["job"])
    assert got == {(50 * MIN, "api-server"): 100.0, (50 * MIN, "app-server"): 500.0}

    q = 'max by (job) (http_requests)'
    got = rows_to_dict(engine.query_instant(samples, q, 50 * MIN), ["job"])
    assert got == {(50 * MIN, "api-server"): 400.0, (50 * MIN, "app-server"): 800.0}

    q = 'count by (group) (http_requests)'
    got = rows_to_dict(engine.query_instant(samples, q, 50 * MIN), ["group"])
    assert got == {(50 * MIN, "canary"): 4.0, (50 * MIN, "production"): 4.0}


def test_group_agg(engine, samples):
    got = rows_to_dict(
        engine.query_instant(samples, "group by (job) (http_requests)", 50 * MIN),
        ["job"],
    )
    assert got == {(50 * MIN, "api-server"): 1.0, (50 * MIN, "app-server"): 1.0}


def test_stddev_stdvar(engine, samples):
    got = rows_to_dict(engine.query_instant(samples, "stddev(http_requests)", 50 * MIN), [])
    assert got[(50 * MIN,)] == pytest.approx(229.12878474779198)
    got = rows_to_dict(engine.query_instant(samples, "stdvar(http_requests)", 50 * MIN), [])
    assert got[(50 * MIN,)] == pytest.approx(52500.0)


def test_topk_bottomk_keep_labels(engine, samples):
    df = engine.query_instant(samples, "topk(2, http_requests)", 50 * MIN)
    got = rows_to_dict(df, ["job", "instance", "group"])
    assert got == {
        (50 * MIN, "app-server", "1", "canary"): 800.0,
        (50 * MIN, "app-server", "0", "canary"): 700.0,
    }
    # __name__ preserved on topk results
    names = {r["labels"].get("__name__") for r in df.collect()}
    assert names == {"http_requests"}

    df = engine.query_instant(
        samples, "bottomk by (group) (1, http_requests)", 50 * MIN
    )
    got = rows_to_dict(df, ["job", "instance", "group"])
    assert got == {
        (50 * MIN, "api-server", "0", "production"): 100.0,
        (50 * MIN, "api-server", "0", "canary"): 300.0,
    }


def test_quantile(engine, samples):
    # quantile 0.5 over 8 values 100..800 → rank=0.5*7=3.5 → 450
    got = rows_to_dict(engine.query_instant(samples, "quantile(0.5, http_requests)", 50 * MIN), [])
    assert got[(50 * MIN,)] == pytest.approx(450.0)
    got = rows_to_dict(engine.query_instant(samples, "quantile(0, http_requests)", 50 * MIN), [])
    assert got[(50 * MIN,)] == 100.0
    got = rows_to_dict(engine.query_instant(samples, "quantile(2, http_requests)", 50 * MIN), [])
    assert got[(50 * MIN,)] == math.inf


def test_count_values(engine, spark):
    e = engine
    df = corpus.load(
        spark,
        MIN,
        [
            'version{instance="a"} 6',
            'version{instance="b"} 6',
            'version{instance="c"} 8',
        ],
    )
    got = rows_to_dict(e.query_instant(df, 'count_values("version", version)', MIN), ["version"])
    assert got == {(MIN, "6"): 2.0, (MIN, "8"): 1.0}


def test_agg_of_range_function(engine, samples):
    df = engine.query_instant(
        samples, 'sum by (job) (rate(http_requests[25m]))', 50 * MIN
    )
    got = rows_to_dict(df, ["job"])
    # each series increases by (10..80)/300s per second
    assert got[(50 * MIN, "api-server")] == pytest.approx((10 + 20 + 30 + 40) / 300)
    assert got[(50 * MIN, "app-server")] == pytest.approx((50 + 60 + 70 + 80) / 300)


def test_range_query_aggregation(engine, samples):
    df = engine.query_range(
        samples, "sum(http_requests)", 10 * MIN, 20 * MIN, 5 * MIN
    )
    got = rows_to_dict(df, [])
    assert got == {
        (10 * MIN,): 720.0,
        (15 * MIN,): 1080.0,
        (20 * MIN,): 1440.0,
    }


def test_nan_aggregation_semantics(engine, spark):
    # aggregators.test:226-247 — NaN skipped unless all values are NaN
    df = corpus.load(
        spark,
        5 * MIN,
        [
            'http_requests{job="api-server", instance="0", group="production"} 1',
            'http_requests{job="api-server", instance="1", group="production"} 2',
            'http_requests{job="api-server", instance="0", group="canary"} NaN',
            'http_requests{job="api-server", instance="1", group="canary"} 3',
            'http_requests{job="api-server", instance="2", group="canary"} 4',
        ],
    )
    assert rows_to_dict(engine.query_instant(df, "max(http_requests)", 0), []) == {
        (0,): 4.0
    }
    assert rows_to_dict(engine.query_instant(df, "min(http_requests)", 0), []) == {
        (0,): 1.0
    }
    got = rows_to_dict(
        engine.query_instant(df, "max by (group) (http_requests)", 0), ["group"]
    )
    assert got == {(0, "canary"): 4.0, (0, "production"): 2.0}


def test_topk_nan_sorted_last_and_scalar_k(engine, spark):
    import math

    df = corpus.load(
        spark,
        5 * MIN,
        [
            'http_requests{job="api-server", instance="0", group="production"} 0+10x10',
            'http_requests{job="api-server", instance="1", group="production"} 0+20x10',
            'http_requests{job="api-server", instance="2", group="production"} NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN NaN',
            "foo 3+0x10",
        ],
    )
    out = engine.query_instant(
        df, 'topk(3, http_requests{job="api-server",group="production"})', 50 * MIN
    ).collect()
    vals = sorted(
        (r["labels"]["instance"], r["value"]) for r in out
    )
    assert vals[0] == ("0", 100.0) and vals[1] == ("1", 200.0)
    assert vals[2][0] == "2" and math.isnan(vals[2][1])
    # huge k → min(k, n) results
    out = engine.query_instant(
        df, 'bottomk(9999999999, http_requests{instance="0"})', 50 * MIN
    )
    assert out.count() == 1
    # k from a scalar expression (aggregators.test:321 bug #5276)
    out = engine.query_instant(df, "topk(scalar(foo), http_requests)", 50 * MIN)
    assert out.count() == 3
