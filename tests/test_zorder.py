"""Z-order layout: key correctness, clustering quality, answer invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metric_store_release_spark.sources.zorder import (
    file_spans,
    normalize_to_rank,
    read_zordered,
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    # x=0b101, y=0b011 → bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    df = spark.range(1).select(
        zorder_key([F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], bits=3).alias("z")
    )
    assert df.first().z == 27


def test_zorder_key_preserves_curve_locality(spark):
    # adjacent ranks in both dims → z keys within a 4-cell block
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long"
    ).select("x", "y", zorder_key([F.col("x"), F.col("y")], bits=2).alias("z"))
    rows = {(r.x, r.y): r.z for r in df.collect()}
    assert sorted(rows.values()) == list(range(16))  # bijection on the grid
    # the 2×2 sub-blocks are contiguous runs of 4 on the curve
    for bx in (0, 2):
        for by in (0, 2):
            block = {rows[(bx + dx, by + dy)] for dx in (0, 1) for dy in (0, 1)}
            assert max(block) - min(block) == 3


def test_normalize_to_rank_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double")
    ranks = [r[0] for r in df.select(normalize_to_rank(F.col("v"), 0, 100, 4)).collect()]
    assert ranks[0] == 0 and ranks[1] == 0
    assert ranks[3] == 15 and ranks[4] == 15
    assert 0 < ranks[2] < 15


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """The same synthetic fact written ts-sorted (natural) and z-ordered."""
    base = tmp_path_factory.mktemp("zorder")
    n_users, n_ts = 200, 500
    df = (
        spark.range(n_users * n_ts)
        .select(
            (F.col("id") % n_users).alias("user_id"),
            (F.col("id") / n_users).cast("long").alias("ts_ms"),
            (F.col("id") % 7).cast("double").alias("value"),
        )
    )
    natural = f"{base}/natural"
    df.repartitionByRange(16, "ts_ms").sortWithinPartitions("ts_ms").write.parquet(natural)
    zpath = f"{base}/zordered"
    zkey = zorder_key(
        [
            normalize_to_rank(F.col("user_id"), 0, n_users - 1, 16),
            normalize_to_rank(F.col("ts_ms"), 0, n_ts - 1, 16),
        ]
    )
    write_zordered(df, zpath, zkey, n_files=16)
    return natural, zpath


def test_zorder_files_are_narrow_in_both_dims(spark, layouts):
    natural, zpath = layouts
    def mean_span(path, col, width):
        spans = file_spans(spark.read.parquet(path), [col]).select(
            ((F.col(f"{col}_max") - F.col(f"{col}_min")) / F.lit(width)).alias("s")
        )
        return spans.agg(F.avg("s")).first()[0]

    # natural layout: tight in ts, every file spans ~all users
    assert mean_span(natural, "ts_ms", 500) < 0.15
    assert mean_span(natural, "user_id", 200) > 0.9
    # z-ordered: narrow in BOTH dimensions → min/max stats prune a 2-D
    # range predicate multiplicatively
    assert mean_span(zpath, "ts_ms", 500) < 0.5
    assert mean_span(zpath, "user_id", 200) < 0.5


def test_layout_never_changes_answers(spark, layouts):
    natural, zpath = layouts
    def agg(df):
        return {
            tuple(r)
            for r in df.filter(
                F.col("user_id").between(10, 29) & F.col("ts_ms").between(100, 199)
            )
            .groupBy(F.col("value").alias("v"))
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("ts_ms"), 6).alias("s"))
            .collect()
        }

    assert agg(spark.read.parquet(natural)) == agg(read_zordered(spark, zpath))


def test_hilbert_matches_reference_walk(spark):
    """hilbert_key must equal the classic iterative xy->d reference."""
    import random

    from metric_store_release_spark.sources.zorder import hilbert_key

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    random.seed(11)
    pts = [(random.randrange(256), random.randrange(256)) for _ in range(200)]
    pts += [(0, 0), (255, 255), (0, 255), (255, 0)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select(
            "x", "y", hilbert_key(F.col("x"), F.col("y"), bits=8).alias("d")
        ).collect()
    }
    assert got == {(x, y): xy2d(256, x, y) for x, y in pts}


def test_hilbert_spans_no_worse_than_zorder(spark, layouts, tmp_path):
    """Same grid, same file count: the Hilbert layout's mean per-file
    span must be narrow in both dims and its worst-dimension mean span
    no worse than Morton's (the curve has no diagonal jumps)."""
    from metric_store_release_spark.sources.zorder import hilbert_key

    natural, zpath = layouts
    n_users, n_ts = 200, 500
    df = spark.read.parquet(natural)
    hpath = f"{tmp_path}/hilbert"
    hkey = hilbert_key(
        normalize_to_rank(F.col("user_id"), 0, n_users - 1, 16),
        normalize_to_rank(F.col("ts_ms"), 0, n_ts - 1, 16),
    )
    write_zordered(df, hpath, hkey, n_files=16)

    def mean_span(path, col, width):
        spans = file_spans(spark.read.parquet(path), [col]).select(
            ((F.col(f"{col}_max") - F.col(f"{col}_min")) / F.lit(width)).alias("s")
        )
        return spans.agg(F.avg("s")).first()[0]

    hu = mean_span(hpath, "user_id", n_users)
    ht = mean_span(hpath, "ts_ms", n_ts)
    zu = mean_span(zpath, "user_id", n_users)
    zt = mean_span(zpath, "ts_ms", n_ts)
    assert hu < 0.5 and ht < 0.5
    assert max(hu, ht) <= max(zu, zt) * 1.05  # no worse than Morton
    # answers identical across all three layouts
    q = lambda p: {
        tuple(r)
        for r in spark.read.parquet(p)
        .filter(F.col("user_id").between(10, 29) & F.col("ts_ms").between(100, 199))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert q(hpath) == q(natural)
