"""Samples storage: date-partitioned Parquet (the 24 h TSM shard analog).

Reference: points bucket into 24 h shards keyed by day-truncated epoch-ns
(influx_adapter.go:326-370); expiry drops whole shards past retention
(store.go:158-214). Spark-native equivalent: `partitionBy(date)` parquet —
time-range predicates prune partitions at plan time, and retention is a
partition drop. `name` stays a top-level column so equality matchers push
into row-group filters (the TSI-index analog).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "date"


def write_samples(samples: DataFrame, path: str, mode: str = "append") -> None:
    """samples (ts ms, name, value, labels[, stale]) → partitioned parquet."""
    out = samples.withColumn(
        PARTITION_COL, F.to_date(F.timestamp_millis(F.col("ts")))
    )
    out.write.partitionBy(PARTITION_COL).mode(mode).parquet(path)


def read_samples(spark: SparkSession, path: str) -> DataFrame:
    """Keeps the `date` partition column: the engine derives a partition
    predicate from each query's time bounds so whole shards prune at plan
    time (the reference's forTimestampRange shard walk)."""
    return spark.read.parquet(path)


def expire_shards(path: str, cutoff_date: str) -> list[str]:
    """Drop partitions older than cutoff (store.go:158-176 expiry walk).

    Returns the dropped partition names. Local-filesystem implementation;
    on a real warehouse this is an ALTER TABLE DROP PARTITION / Delta
    VACUUM."""
    root = Path(path)
    dropped = []
    for part in sorted(root.glob(f"{PARTITION_COL}=*")):
        day = part.name.split("=", 1)[1]
        if day < cutoff_date:
            shutil.rmtree(part)
            dropped.append(part.name)
    return dropped


def compact_shards(
    spark: SparkSession, path: str, target_files_per_shard: int = 1
) -> int:
    """Rewrite each date partition to few large files — the Delta OPTIMIZE /
    TSM full-compaction analog (store.go:120-125 scheduled compaction).
    Returns the number of compacted partitions."""
    root = Path(path)
    n = 0
    for part in sorted(root.glob(f"{PARTITION_COL}=*")):
        files = list(part.glob("*.parquet"))
        if len(files) <= target_files_per_shard:
            continue
        df = spark.read.parquet(str(part))
        tmp = str(part) + ".compact"
        df.coalesce(target_files_per_shard).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(part)
        Path(tmp).rename(part)
        n += 1
    return n
