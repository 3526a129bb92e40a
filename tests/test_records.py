"""Record linkage / entity resolution (pipeline.records).

The load-bearing claims, each pinned here:
  - the Fellegi–Sunter scored pairs equal a brute-force all-pairs
    scoring (the combinatorial subset blocking loses nothing);
  - `blocking_is_lossless` refuses configurations where a match could
    slip past the (block_col, subset-key) candidate filter;
  - the token-cap guard raises executor-side, not silently truncates;
  - entity ids are the transitive closure's min-member labels.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.records import (
    blocking_is_lossless,
    entity_resolution,
    normalize_tokens,
    record_linkage_pairs,
)

W = {"brand": 1.0, "cents": 0.5}
NAME_W = 1.5
THRESHOLD = 2.4


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "pk long, name string, brand string, cents long"
    )


def _brute_pairs(rows):
    """All-pairs reference scoring in plain Python."""
    out = set()
    for (ia, na, ba, ca), (ib, nb, bb, cb) in itertools.combinations(
        sorted(rows), 2
    ):
        ta, tb = set(na.split()), set(nb.split())
        j = len(ta & tb) / len(ta | tb)
        score = (
            NAME_W * j + W["brand"] * (ba == bb) + W["cents"] * (ca == cb)
        )
        if score >= THRESHOLD - 5e-7:
            out.add((ia, ib, round(j, 6), int(ba == bb), int(ca == cb)))
    return out


def test_scored_pairs_and_decision_paths(spark):
    rows = [
        (1, "misty lavender chocolate forest navy", "Brand#11", 100),
        # one token replaced: J=4/6, brand+price agree -> 2.5 match
        (2, "zzq lavender chocolate forest navy", "Brand#11", 100),
        # same token SET reordered: J=1, price off -> 2.5 match
        (3, "navy forest chocolate lavender misty", "Brand#11", 102),
        # brand differs: score 2.0 -> no match even at J=1
        (4, "misty lavender chocolate forest navy", "Brand#22", 100),
        # disjoint tokens: 1.5 -> no match
        (5, "aaa bbb ccc ddd eee", "Brand#11", 100),
    ]
    got = {
        (r.id_a, r.id_b, r.name_jacc, r.brand_match, r.cents_match)
        for r in record_linkage_pairs(
            _mk(spark, rows), "pk", "name", "brand", W, NAME_W, THRESHOLD
        ).collect()
    }
    assert got == _brute_pairs(rows)
    assert (1, 2, 0.666667, 1, 1) in got
    assert (1, 3, 1.0, 1, 0) in got
    assert not any(4 in (a, b) or 5 in (a, b) for a, b, *_ in got)


def test_blocking_equals_brute_force_randomized(spark):
    """Subset blocking is lossless on a randomized corpus: low-entropy
    vocab (to force crowded blocks), token counts 1..8, three brands,
    colliding price points."""
    rng = random.Random(1105)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for pk in range(120):
        n = rng.randint(1, 8)
        rows.append(
            (
                pk,
                " ".join(sorted(rng.sample(vocab, n))),
                f"Brand#{rng.randint(1, 3)}",
                rng.choice([100, 200, 300]),
            )
        )
    got = {
        (r.id_a, r.id_b, r.name_jacc, r.brand_match, r.cents_match)
        for r in record_linkage_pairs(
            _mk(spark, rows), "pk", "name", "brand", W, NAME_W, THRESHOLD
        ).collect()
    }
    assert got == _brute_pairs(rows)
    assert len(got) > 20  # the fixture actually exercises the threshold


def test_normalize_tokens_is_canonical(spark):
    df = spark.range(1).select(
        normalize_tokens(F.lit("  Navy,FOREST  navy; chocolate!")).alias("t")
    )
    assert df.collect()[0].t == ["chocolate", "forest", "navy"]


def test_lossless_guard_refuses_lossy_configs():
    # reachable without the block field -> lossy
    with pytest.raises(ValueError, match="lossy"):
        blocking_is_lossless(1.5, W, "brand", 1.9)
    # block-safe (0.5 + 0.5 < 2.2) but reachable at J=0 -> no token floor
    with pytest.raises(ValueError, match="Jaccard 0"):
        blocking_is_lossless(0.5, {"brand": 2.0, "cents": 0.5}, "brand", 2.2)
    # block field must be weighted
    with pytest.raises(ValueError, match="weight"):
        blocking_is_lossless(1.5, {"cents": 0.5}, "brand", 2.4)
    assert blocking_is_lossless(1.5, W, "brand", 2.4) == pytest.approx(0.6)


def test_token_cap_raises_executor_side(spark):
    df = _mk(spark, [(1, "a b c d e f g h i j", "x", 0)])
    with pytest.raises(Exception, match="max_tokens"):
        record_linkage_pairs(
            df, "pk", "name", "brand", W, NAME_W, THRESHOLD
        ).collect()


def test_entity_resolution_transitive_min_label(spark):
    rows = [
        (7, "misty lavender chocolate forest navy", "Brand#11", 100),
        (3, "zzq lavender chocolate forest navy", "Brand#11", 100),
        # links to 3 (J=4/6 via zzq..navy? shares lavender chocolate
        # forest navy zzr) but not directly to 7's full set
        (9, "zzq lavender chocolate forest zzr", "Brand#11", 100),
        (50, "aaa bbb ccc ddd eee", "Brand#11", 100),
    ]
    got = sorted(
        (r.id, r.entity_id)
        for r in entity_resolution(
            _mk(spark, rows), "pk", "name", "brand", W, NAME_W, THRESHOLD
        ).collect()
    )
    # 7-3 match (J=4/6 -> 2.5); 3-9 match (J=4/6 -> 2.5); 7-9 only
    # through 3 (J(7,9)=3/7 -> 2.14 no) -> one transitive entity, min=3
    assert got == [(3, 3), (7, 3), (9, 3)]


def test_no_cartesian_in_plan(spark):
    df = _mk(spark, [(1, "a b c", "x", 0), (2, "a b d", "x", 0)])
    plan = record_linkage_pairs(
        df, "pk", "name", "brand", W, NAME_W, THRESHOLD
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
