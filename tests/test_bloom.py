"""Bloom-filter membership sketch + bloom decontamination.

Build correctness (no false negatives, bounded false positives),
executed-plan mergeability (elementwise bit_or), and the decontamination
pipeline's superset-of-exact guarantee and join-free probe plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.sketches import (
    bloom_bits,
    bloom_dense_words,
    bloom_member,
)

M, K = 4096, 4


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )


def test_no_false_negatives(spark, keys):
    words = bloom_dense_words(bloom_bits(keys, "k", M, K), M)
    misses = keys.filter(~bloom_member(F.col("k"), words, M, K)).count()
    assert misses == 0


def test_false_positive_rate_bounded(spark, keys):
    words = bloom_dense_words(bloom_bits(keys, "k", M, K), M)
    probe = spark.range(10_000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    fp = probe.filter(bloom_member(F.col("k"), words, M, K)).count()
    # n=500, m=4096, k=4 → theoretical FP ≈ (1-e^(-4*500/4096))^4 ≈ 2.2%
    assert fp / 10_000 < 0.06


def test_merge_equals_whole_build(spark, keys):
    """Sharded build + (word) groupBy-bit_or == single build: the sketch
    is mergeable in the executed plan, not just in theory."""
    a = bloom_bits(keys.filter(F.col("k") < "key-3"), "k", M, K)
    b = bloom_bits(keys.filter(F.col("k") >= "key-3"), "k", M, K)
    merged = (
        a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_bits(keys, "k", M, K)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_bloom_contamination_superset_of_exact(spark):
    from metric_store_release_spark.pipeline.dedup import (
        bloom_contamination,
        ngram_contamination,
    )

    words = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, words),                        # contaminated: bench copies it
            (2, "totally different text " * 8),
            (3, "x " + words),                 # shares 13-gram runs with 1
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, words)], ["doc_id", "text"])
    exact = {
        r["doc_id"]
        for r in ngram_contamination(docs, bench, window_n=13).collect()
    }
    got = bloom_contamination(docs, bench, window_n=13)
    hits = {r["doc_id"]: r["hit_windows"] for r in got.collect()}
    # bloom can only ADD false positives, never miss a true collision
    assert exact <= set(hits)
    assert 2 not in exact  # sanity: doc 2 genuinely clean
    assert hits[1] >= 1 and hits[3] >= 1


def test_bloom_probe_plan_shape(spark):
    from metric_store_release_spark.pipeline.dedup import bloom_contamination

    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "tok " * 20) for i in range(10)],
        ["doc_id", "text"],
    )
    bench = docs.limit(2)
    plan = (
        bloom_contamination(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only join is the 1-row bitmap broadcast; the benchmark GRAM
    # table itself is never a join side and the probe grams never shuffle
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_bloom_autosize_grows_with_benchmark():
    from metric_store_release_spark.pipeline.sketches import bloom_size_bits

    assert bloom_size_bits(10) == 65_536          # floor
    assert bloom_size_bits(10_000) == 1 << 19      # 320k → 2^19
    assert bloom_size_bits(5_000_000) == 1 << 28   # 160M → 2^28
    # the SQL replay identity: 1 << v.bit_length() == 2^len(bin(v))
    for v in (1, 2, 3, 31, 32, 33, 2**20 - 1, 2**20):
        assert 1 << v.bit_length() == 2 ** len(bin(v)[2:])
