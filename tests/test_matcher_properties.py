"""Randomized matcher-semantics check: the engine's matcher_condition vs a
Python re.fullmatch model of PromQL's fully-anchored RE2 matching.

Complements the corpus goldens (fixed expressions) with a seeded sweep over
generated (pattern, value) pairs — anchoring, alternation-vs-anchor
precedence (`a|b` must mean `^(?:a|b)$`, not `^a|b$`), empty-pattern and
absent-label ("" match) edges. Patterns stay in the RE2 ∩ Java ∩ Python
common subset (literals, `.`, `*`, `+`, `?`, `|`, character classes,
grouping) so all three regex engines agree on the language.
"""

from __future__ import annotations

import random
import re

import pytest

from pyspark.sql import functions as F

from metric_store_release_spark.engine.selectors import matcher_condition
from metric_store_release_spark.promql.ast import LabelMatcher, MatchOp

ALPHABET = "ab1_"
PIECES = ["a", "b", "1", "_", ".", "a*", "b+", "1?", "[ab]", "[^a]", "(ab)", "a|b"]


def _random_pattern(rng: random.Random) -> str:
    return "".join(rng.choice(PIECES) for _ in range(rng.randint(0, 4)))


def _random_value(rng: random.Random) -> str:
    return "".join(rng.choice(ALPHABET) for _ in range(rng.randint(0, 5)))


def _cases(seed: int, n: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    cases = [(_random_pattern(rng), _random_value(rng)) for _ in range(n)]
    # pin the classic traps alongside the random sweep
    cases += [
        ("a|b", "a"), ("a|b", "ab"), ("a|b", ""),      # anchored alternation
        ("", ""), ("", "a"),                           # empty pattern
        (".*", ""), (".+", ""),                        # empty value
        ("a.*", "ab1"), ("a", "aa"),                   # prefix not enough
    ]
    return cases


@pytest.mark.parametrize("op", [MatchOp.RE, MatchOp.NRE])
def test_regex_matcher_matches_fullmatch_model(spark, op):
    cases = _cases(seed=20260813, n=300)
    rows = [(i, p, v) for i, (p, v) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, p string, v string").select(
        "i",
        "p",
        "v",
        F.lit(None).cast("string").alias("name"),
        F.create_map(F.lit("l"), F.col("v")).alias("labels"),
    )
    # ONE evaluation for all cases: chain per-pattern conditions into a
    # single expression so the whole sweep is one Spark job
    ok = F.lit(None).cast("boolean")
    expr = None
    for pat in sorted({p for p, _ in cases}):
        cond = matcher_condition(LabelMatcher(name="l", op=op, value=pat))
        branch = (F.col("p") == F.lit(pat), cond)
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    got = {
        r["i"]: r["ok"]
        for r in df.withColumn("ok", expr.otherwise(ok)).select("i", "ok").collect()
    }
    for i, (pat, val) in enumerate(cases):
        want = bool(re.fullmatch(f"(?:{pat})", val))
        if op == MatchOp.NRE:
            want = not want
        assert got[i] == want, (
            f"case {i}: pattern {pat!r} value {val!r} op {op}: "
            f"engine={got[i]} model={want}"
        )


def test_absent_label_matches_empty(spark):
    """PromQL: a matcher on an absent label sees "" — `{missing=~".*"}` and
    `{missing=""}` match, `{missing=~".+"}` does not."""
    df = spark.createDataFrame(
        [(1,)], "i long"
    ).select("i", F.lit("m").alias("name"), F.create_map(F.lit("x"), F.lit("1")).alias("labels"))
    for op, pat, want in [
        (MatchOp.EQ, "", True),
        (MatchOp.RE, ".*", True),
        (MatchOp.RE, ".+", False),
        (MatchOp.NEQ, "", False),
    ]:
        m = LabelMatcher(name="missing", op=op, value=pat)
        n = df.filter(matcher_condition(m)).count()
        assert bool(n) == want, f"{op} {pat!r}"
