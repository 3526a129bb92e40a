"""streaming/dedup_stream.py: foreachBatch incremental near-dup filter.

Batch/stream equivalence of the dedup lifecycle: dup docs planted
within one micro-batch, across micro-batches, and against an already-
dead doc's text; the persistent band index must catch all three under
maxFilesPerTrigger=1 sequencing.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from metric_store_release_spark.streaming.dedup_stream import (
    streaming_minhash_dedup,
)

#: shingle-rich, pairwise-disjoint texts
_T1 = "alpha beta gamma delta epsilon zeta eta theta"
_T2 = "one two three four five six seven eight nine"
_T4 = "red orange yellow green blue indigo violet pink"
_T8 = "north south east west up down left right middle"


def _write_batches(spark, src):
    batches = [
        [(1, _T1), (2, _T2)],
        # 3 copies batch-1's doc 1 (cross-batch); 5 copies 4 (within-batch)
        [(3, _T1), (4, _T4), (5, _T4)],
        # 6 copies survivor 4; 7 copies DEAD doc 5's text (must still die
        # via survivor 4's index entry); 8 is fresh
        [(6, _T4), (7, _T4), (8, _T8)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.05)  # distinct mtimes: FileStreamSource orders by them


def test_streaming_dedup_three_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    _write_batches(spark, src)

    reports: dict[int, set[tuple[int, int]]] = {}
    fn = streaming_minhash_dedup(
        index,
        on_batch=lambda bid, rows: reports.setdefault(bid, set()).update(
            (r["dead"], r["matched"]) for r in rows
        ),
    )
    schema = "doc_id long, text string"
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    survivors = {
        r["doc_id"]
        for r in spark.read.parquet(index).select("doc_id").distinct().collect()
    }
    assert survivors == {1, 2, 4, 8}

    all_deaths = {d for s in reports.values() for d in s}
    # cross-batch: 3 died against indexed 1; within-batch: 5 died against
    # smaller-id 4; later: 6 and 7 died against survivor 4
    assert {(3, 1), (5, 4), (6, 4), (7, 4)} <= all_deaths
    dead_ids = {d for d, _ in all_deaths}
    assert dead_ids == {3, 5, 6, 7}


def test_streaming_dedup_restart_resumes_from_index(spark, tmp_path):
    """State lives in the index table: a brand-new query (fresh
    checkpoint) over a NEW source still kills dups against the index
    built by an earlier run."""
    src1 = str(tmp_path / "s1")
    src2 = str(tmp_path / "s2")
    index = str(tmp_path / "index")

    spark.createDataFrame([(1, _T1)], ["doc_id", "text"]).write.parquet(src1)
    fn = streaming_minhash_dedup(index)
    (
        spark.readStream.schema("doc_id long, text string").parquet(src1)
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "c1"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    )

    spark.createDataFrame(
        [(9, _T1), (10, _T2)], ["doc_id", "text"]
    ).write.parquet(src2)
    reports: list = []
    fn2 = streaming_minhash_dedup(
        index, on_batch=lambda bid, rows: reports.extend(rows)
    )
    (
        spark.readStream.schema("doc_id long, text string").parquet(src2)
        .writeStream.foreachBatch(fn2)
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    )
    survivors = {
        r["doc_id"]
        for r in spark.read.parquet(index).select("doc_id").distinct().collect()
    }
    assert survivors == {1, 10}
    assert {(r["dead"], r["matched"]) for r in reports} == {(9, 1)}
