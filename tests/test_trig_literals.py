"""Trig functions + literal parsing — vendor promql/testdata/{trig_functions,literals}.test."""

from __future__ import annotations

import math

import pytest

from metric_store_release_spark.sources import corpus
from tests.conftest import rows_to_dict

MIN = 60_000


@pytest.fixture(scope="module")
def trig(spark):
    df = corpus.load(
        spark, 5 * MIN, ['trig{l="x"} 10', 'trig{l="y"} 20', 'trig{l="NaN"} NaN']
    )
    df.cache().count()
    return df


@pytest.mark.parametrize(
    "fn,x10,y20",
    [
        ("sin", -0.5440211108893699, 0.9129452507276277),
        ("cos", -0.8390715290764524, 0.40808206181339196),
        ("tan", 0.6483608274590867, 2.2371609442247427),
        ("atan", 1.4711276743037345, 1.5208379310729538),
        ("sinh", 11013.232920103324, 2.4258259770489514e08),
        ("tanh", 0.9999999958776927, 1.0),
        ("rad", 0.17453292519943295, 0.3490658503988659),
        ("deg", 572.9577951308232, 1145.9155902616465),
    ],
)
def test_trig_functions(engine, trig, fn, x10, y20):
    got = rows_to_dict(engine.query_instant(trig, f"{fn}(trig)", 5 * MIN), ["l"])
    # the upstream harness compares with ~1e-6 relative epsilon (test.go)
    assert got[(5 * MIN, "x")] == pytest.approx(x10, rel=1e-6)
    assert got[(5 * MIN, "y")] == pytest.approx(y20, rel=1e-6)
    assert math.isnan(got[(5 * MIN, "NaN")])


def test_asin_acos_domain(engine, trig):
    got = rows_to_dict(engine.query_instant(trig, "asin(trig - 10.1)", 5 * MIN), ["l"])
    assert got[(5 * MIN, "x")] == pytest.approx(-0.10016742116155944)
    assert math.isnan(got[(5 * MIN, "y")])  # out of [-1,1] → NaN
    got = rows_to_dict(engine.query_instant(trig, "acos(trig - 10.1)", 5 * MIN), ["l"])
    assert got[(5 * MIN, "x")] == pytest.approx(1.670963747956456)
    assert math.isnan(got[(5 * MIN, "y")])


def test_pi_and_atan2(engine, trig):
    got = rows_to_dict(engine.query_instant(trig, "pi()", 5 * MIN), [])
    assert got[(5 * MIN,)] == pytest.approx(math.pi)
    got = rows_to_dict(
        engine.query_instant(trig, 'trig{l="x"} atan2 trig{l="x"}', 5 * MIN), ["l"]
    )
    assert got[(5 * MIN, "x")] == pytest.approx(math.atan2(10, 10))


# literals.test essentials
@pytest.mark.parametrize(
    "expr,want",
    [
        ("12.34e6", 12340000.0),
        ("12.34e+6", 12340000.0),
        ("12.34e-6", 0.00001234),
        ("1+1", 2.0),
        ("1-1", 0.0),
        ("1 - -1", 2.0),
        (".2", 0.2),
        ("+Inf", math.inf),
        ("-Inf", -math.inf),
        ("0x8f", 143.0),
        ("-(1)", -1.0),
        # unary binds at multiplicative precedence, looser than ^
        # (generated_parser.y: unary_op expr %prec MUL)
        ("-2^2", -4.0),
        ("-2^-2", -0.25),
        ("2^-2", 0.25),
        ("-1^2 + 2", 1.0),
    ],
)
def test_number_literals(engine, trig, expr, want):
    got = rows_to_dict(engine.query_instant(trig, expr, 5 * MIN), [])
    assert got[(5 * MIN,)] == want


def test_nan_literal(engine, trig):
    got = rows_to_dict(engine.query_instant(trig, "NaN", 5 * MIN), [])
    assert math.isnan(got[(5 * MIN,)])
