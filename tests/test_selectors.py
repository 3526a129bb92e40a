"""Selector semantics vs the upstream corpus goldens.

Fixture mirrors vendor/.../promql/testdata/aggregators.test:1-13 (FIXTURES.md
§F2): 8 http_requests series, load step 5m, values i·(10|20|…|80).
"""

from __future__ import annotations

import math

import pytest

from metric_store_release_spark.sources import corpus
from tests.conftest import rows_to_dict

MIN = 60_000

HTTP_REQUESTS = [
    'http_requests{job="api-server", instance="0", group="production"} 0+10x10',
    'http_requests{job="api-server", instance="1", group="production"} 0+20x10',
    'http_requests{job="api-server", instance="0", group="canary"} 0+30x10',
    'http_requests{job="api-server", instance="1", group="canary"} 0+40x10',
    'http_requests{job="app-server", instance="0", group="production"} 0+50x10',
    'http_requests{job="app-server", instance="1", group="production"} 0+60x10',
    'http_requests{job="app-server", instance="0", group="canary"} 0+70x10',
    'http_requests{job="app-server", instance="1", group="canary"} 0+80x10',
    'foo{job="api-server", instance="0", region="europe"} 0+90x10',
    'foo{job="api-server"} 0+100x10',
]


@pytest.fixture(scope="module")
def samples(spark):
    df = corpus.load(spark, 5 * MIN, HTTP_REQUESTS)
    df.cache().count()
    return df


def test_plain_selector_at_50m(engine, samples):
    df = engine.query_instant(samples, 'http_requests{job="api-server"}', 50 * MIN)
    got = rows_to_dict(df, ["instance", "group"])
    assert got == {
        (50 * MIN, "0", "production"): 100.0,
        (50 * MIN, "1", "production"): 200.0,
        (50 * MIN, "0", "canary"): 300.0,
        (50 * MIN, "1", "canary"): 400.0,
    }


def test_lookback_picks_latest_within_5m(engine, samples):
    # at 52m the 50m samples are the freshest within the 5m lookback
    df = engine.query_instant(
        samples, 'http_requests{job="api-server", group="canary"}', 52 * MIN
    )
    got = rows_to_dict(df, ["instance"])
    assert got == {(52 * MIN, "0"): 300.0, (52 * MIN, "1"): 400.0}


def test_lookback_expires(engine, samples):
    # series end at 50m; at 56m the lookback (5m, strict) has passed
    df = engine.query_instant(samples, "http_requests", 56 * MIN)
    assert df.count() == 0


def test_regex_and_negative_matchers(engine, samples):
    df = engine.query_instant(
        samples, 'http_requests{job=~"api-.*", instance!="1"}', 50 * MIN
    )
    got = rows_to_dict(df, ["group"])
    assert got == {
        (50 * MIN, "production"): 100.0,
        (50 * MIN, "canary"): 300.0,
    }


def test_empty_label_matcher_matches_absent(engine, samples):
    # region="" matches series WITHOUT a region label (aggregators.test:11-13)
    df = engine.query_instant(samples, 'foo{region=""}', 50 * MIN)
    got = rows_to_dict(df, ["region"])
    assert got == {(50 * MIN, None): 1000.0}


def test_offset(engine, samples):
    df = engine.query_instant(
        samples, 'http_requests{job="api-server", instance="0", group="production"} offset 10m',
        50 * MIN,
    )
    assert [r["value"] for r in df.collect()] == [80.0]


def test_at_modifier(engine, samples):
    df = engine.query_instant(
        samples,
        'http_requests{job="api-server", instance="0", group="production"} @ 1500',
    # @1500s = 25m
        50 * MIN,
    )
    assert [r["value"] for r in df.collect()] == [50.0]


def test_range_query_grid(engine, samples):
    df = engine.query_range(
        samples,
        'http_requests{job="api-server", instance="0", group="production"}',
        0,
        15 * MIN,
        5 * MIN,
    )
    got = rows_to_dict(df, [])
    assert got == {
        (0,): 0.0,
        (5 * MIN,): 10.0,
        (10 * MIN,): 20.0,
        (15 * MIN,): 30.0,
    }


def test_staleness_marker_ends_series(engine, spark):
    df = corpus.load(spark, MIN, ["m 0 1 stale 3"])
    e = __import__("metric_store_release_spark").PromQLEngine(spark)
    # at 2m the stale marker hides the series
    assert e.query_instant(df, "m", 2 * MIN).count() == 0
    # at 1m it is still visible, at 3m the new sample revives it
    assert [r["value"] for r in e.query_instant(df, "m", MIN).collect()] == [1.0]
    assert [r["value"] for r in e.query_instant(df, "m", 3 * MIN).collect()] == [3.0]


def test_unary_negation(engine, samples):
    df = engine.query_instant(
        samples, '-http_requests{job="api-server", instance="0", group="production"}',
        50 * MIN,
    )
    assert [r["value"] for r in df.collect()] == [-100.0]
