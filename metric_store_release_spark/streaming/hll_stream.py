"""Streaming distinct-count: HLL register merge on the ingest path.

The streaming composition of pipeline.sketches.hll_registers: every
micro-batch computes its own (j, max-rank) register partials — a bounded
m-row artifact regardless of batch size — and max-merges them into a
persistent register STORE (parquet, m rows total). Like the crawl-dedup
stream ([[streaming/dedup_stream.py]]), all state lives in storage, not
in streaming operators: the query itself is stateless (no watermark, no
state store), restarts resume from the store alone, and because HLL
register max-merge is lossless the store always equals the registers of
every row ever ingested — the batch/stream equivalence the tests assert.

At 100 TB ingest this is the shape that works: per-batch work is one
map-side register aggregation, the store is a few KB, and ANY number of
independent ingest streams can merge into the same estimate later
(registers commute; last-merger-wins races are the deployment's
concern, serialized here by foreachBatch's per-epoch execution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.sketches import (
    _hll_estimate,
    hll_registers,
)


def merge_hll_batch(
    batch: DataFrame,
    store_path: str,
    key_col: str,
    p: int = 10,
    salt: str = "hll",
) -> None:
    """Fold one micro-batch's register partials into the store.

    The store is read and OVERWRITTEN in the same epoch, so the merged
    frame is pinned with localCheckpoint(eager) before the write — the
    dedup_stream lesson: a lazy plan that still references the path it
    is about to replace re-reads it mid-write."""
    spark = batch.sparkSession
    regs = hll_registers(batch, key_col, (), p, salt)
    # Explicit first-epoch check (Hadoop FS, so any fs:// scheme works):
    # only a genuinely missing store falls back to this batch's registers.
    # A transient READ failure on an existing store must propagate — the
    # fallback would overwrite accumulated state with one batch, silently
    # breaking the "store == registers of every row ever ingested"
    # contract (merge is lossless only if nothing is dropped).
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        old = spark.read.parquet(store_path)
        merged = (
            old.unionByName(regs).groupBy("j").agg(F.max("r").alias("r"))
        )
    else:  # first epoch: no store yet
        merged = regs
    pinned = merged.localCheckpoint(eager=True)
    pinned.write.mode("overwrite").parquet(store_path)


def run_hll_ingest(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    p: int = 10,
    salt: str = "hll",
):
    """Start the ingest query: foreachBatch register merge, stateless
    (restart needs only source offsets + the store)."""
    return (
        stream.writeStream.foreachBatch(
            lambda b, _epoch: merge_hll_batch(b, store_path, key_col, p, salt)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def store_estimate(spark: SparkSession, store_path: str, p: int = 10) -> float:
    """Distinct-count estimate from the register store alone — identical
    to hll_distinct over every row ever ingested (lossless merge)."""
    regs = spark.read.parquet(store_path)
    aggs, finish = _hll_estimate(p)
    row = regs.agg(*aggs).select(
        finish(F.col("__present"), F.col("__s")).alias("est")
    ).first()
    return row["est"]
