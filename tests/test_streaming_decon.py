"""streaming/decon_stream.py: stateless bloom decontamination pass.

Stream/batch equivalence (the streaming filter keeps exactly the docs the
batch flag clears), agreement with the exact contamination join on
planted copies, and the statelessness claim itself (no stateful operator
in the progress telemetry).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.dedup import (
    bloom_contamination,
    bloom_flag_docs,
)
from metric_store_release_spark.pipeline.sketches import (
    bloom_bits_from_pair,
    bloom_dense_words,
)
from metric_store_release_spark.streaming.decon_stream import (
    streaming_bloom_decontaminate,
)

_BENCH = "the quick brown fox jumps over the lazy dog again and again today"
_CLEAN1 = "completely unrelated text about storage engines and parquet files"
_CLEAN2 = "another clean doc discussing bloom filters md5 hashing and sketches"

M, K, N = 1 << 16, 8, 13


@pytest.fixture(scope="module")
def bench_words(spark):
    bench = spark.createDataFrame([(100, _BENCH)], ["doc_id", "text"])
    from metric_store_release_spark.pipeline.dedup import _window_gram_table

    pairs = (
        _window_gram_table(bench, "text", "doc_id", N)
        .select(
            F.col("h1").alias("__h1"), (F.col("h2") * 2 + 1).alias("__h2")
        )
        .distinct()
    )
    return bloom_dense_words(bloom_bits_from_pair(pairs, M, K), M)


def _docs(spark):
    return spark.createDataFrame(
        [(1, _CLEAN1), (2, _BENCH), (3, _CLEAN2), (4, "pre " + _BENCH)],
        ["doc_id", "text"],
    )


def test_flag_matches_contamination_counts(spark, bench_words):
    docs = _docs(spark)
    bench = spark.createDataFrame([(100, _BENCH)], ["doc_id", "text"])
    flagged = {
        r["doc_id"]
        for r in bloom_flag_docs(docs, bench_words, M, K, window_n=N)
        .filter("contaminated")
        .collect()
    }
    counted = {
        r["doc_id"]
        for r in bloom_contamination(
            docs, bench, window_n=N, m_bits=M
        ).collect()
    }
    assert flagged == counted == {2, 4}


def test_stream_equals_batch_and_is_stateless(spark, bench_words, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    batches = [[(1, _CLEAN1), (2, _BENCH)], [(3, _CLEAN2), (4, "pre " + _BENCH)]]
    for rows in batches:
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(
            1
        ).write.mode("append").parquet(src)
        time.sleep(1.05)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    survivors = streaming_bloom_decontaminate(stream, bench_words, M, K)
    q = (
        survivors.writeStream.format("memory")
        .queryName("decon_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
    finally:
        q.stop()
    got = {
        r["doc_id"] for r in spark.sql("select * from decon_out").collect()
    }
    want = {
        r["doc_id"]
        for r in bloom_flag_docs(_docs(spark), bench_words, M, K, window_n=N)
        .filter(~F.col("contaminated"))
        .collect()
    }
    assert got == want == {1, 3}
    # the statelessness claim: no stateful operator ever appears
    assert all(not p["stateOperators"] for p in progress)
