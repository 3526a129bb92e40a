"""Streaming near-duplicate filtering: foreachBatch + persistent band index.

The crawl-ingest loop at production scale: documents arrive as a stream,
each micro-batch is matched against the ACCUMULATED MinHash band index
(cost proportional to the batch — `pipeline.dedup.minhash_match`'s
contract), and only the batch's surviving documents extend the index.
This is the streaming composition of the batch pieces
([[pipeline/dedup.py]] `minhash_band_table` / `minhash_match`); state
lives in the index table, not in Spark streaming state, so the stream
can restart from any checkpoint and the index stays queryable by batch
jobs (the reference's shard-store analog: durable state in storage, not
in operators).

Duplicate policy (greedy, deterministic): a batch document dies iff
  (a) it LSH-matches any indexed document, or
  (b) it LSH-matches a smaller-id document in the SAME batch.
(b) is non-transitive by design — the smaller-id doc is kept even if it
also dies via (a), matching the first-write-wins semantics of the
write-path dedup in sources/storage.py.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.dedup import minhash_band_table


def streaming_minhash_dedup(
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    on_batch: Callable[[int, list], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function implementing the policy above.

    ``index_path`` is a parquet directory holding the accumulated band
    table (created on first batch). Band parameters are baked into the
    closure — they MUST match across the index lifetime (the
    minhash_match contract). ``on_batch(batch_id, dup_rows)`` receives
    the batch's duplicate verdicts as collected rows
    (batch_doc, matched) for observability/testing; omit it for a pure
    filter.
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        bt = minhash_band_table(
            batch, text_col, id_col, num_hashes, bands, shingle_n
        ).persist()
        bt.count()
        try:
            try:
                index = spark.read.parquet(index_path)
                have_index = True
            except Exception:
                have_index = False
            if have_index:
                # the minhash_match join shape, reusing the already-
                # computed batch band table instead of re-banding
                cross = (
                    bt.join(
                        index.select(
                            F.col(id_col).alias("matched"), "band_id", "bh"
                        ),
                        ["band_id", "bh"],
                    )
                    .select(F.col(id_col).alias("dead"), "matched")
                    .distinct()
                )
            else:
                cross = None
            a, b = bt.alias("a"), bt.alias("b")
            within = (
                a.join(
                    b,
                    (F.col("a.band_id") == F.col("b.band_id"))
                    & (F.col("a.bh") == F.col("b.bh"))
                    & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
                )
                .select(
                    F.col(f"b.{id_col}").alias("dead"),
                    F.col(f"a.{id_col}").alias("matched"),
                )
                .distinct()
            )
            dead = within if cross is None else cross.unionByName(within)
            # MATERIALIZE before the index append — as a leaf, not a
            # cache: dead's plan reads index_path lazily, and inside
            # foreachBatch a later action (the on_batch collect) was
            # observed to MISS the persisted entry and re-evaluate
            # against the just-appended survivor rows, reporting them
            # as matching themselves. localCheckpoint(eager) cuts the
            # lineage so re-evaluation is impossible by construction.
            dead = dead.localCheckpoint(eager=True)
            dead_ids = dead.select(F.col("dead").alias(id_col)).distinct()
            survivors = bt.join(dead_ids, id_col, "left_anti")
            survivors.write.mode("append").parquet(index_path)
            if on_batch is not None:
                on_batch(batch_id, dead.collect())
        finally:
            bt.unpersist()

    return _process
