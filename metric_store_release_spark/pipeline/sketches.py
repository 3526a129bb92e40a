"""Deterministic distinct-count sketching: K-Minimum-Values (KMV).

Bar-Yossef et al. 2002 ("Counting distinct elements in a data stream"):
hash every key to a uniform point in [0, 1); if the k-th smallest of n
distinct uniform points sits at position h_k, then n ≈ (k-1)/h_k. The
sketch is the k smallest distinct hashes — mergeable (union the sets,
re-take the k smallest), fixed-size, and with a deterministic hash fully
reproducible by an external oracle, unlike HLL whose register layout is
engine-specific.

Why not Spark's approx_count_distinct: its HLL++ answer is not
reproducible outside Spark, so it cannot be oracle-checked; KMV with the
repo's shared md5 sampling key (pipeline.text.hash_bucket) gives the same
estimate in any engine that can compute md5.

Scale shape: one distinct on (group, hash) — the same single uniform
shuffle an exact COUNT(DISTINCT) pays — then a per-group row_number to
keep the k smallest BEFORE any aggregation touches a full distinct set.
At 100 TB the distinct-set per group never materializes anywhere: the
window sort is the only per-group cost and AQE splits skewed groups.
The estimator reads one row (the k-th) per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metric_store_release_spark.pipeline.text import hash_bucket

#: hash space size of pipeline.text.hash_bucket (first 8 md5 hex digits)
_SPACE = float(1 << 32)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Estimated distinct ``key_col`` per group: (group..., n_kept,
    est_distinct).

    ``n_kept`` is min(k, observed distinct hashes). Below k the sketch
    holds every distinct hash and the estimate is exact (= n_kept); at k
    it is the KMV estimator (k-1) / (h_k / 2^32). Rounded to 6 decimals
    so any oracle comparison is tolerance-free. Hash collisions (two keys
    on one 32-bit hash) undercount — identically in every engine using
    the same rule, so oracle equality still holds.
    """
    groups = list(group_cols)
    hashed = df.select(
        *groups, hash_bucket(F.col(key_col), salt).alias("__h")
    ).distinct()
    w = Window.partitionBy(*groups).orderBy("__h") if groups else (
        Window.partitionBy(F.lit(1)).orderBy("__h")
    )
    kept = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return kept.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise(
                F.lit(float(k - 1)) / (F.max("__h") / F.lit(_SPACE))
            ),
            6,
        ).alias("est_distinct"),
    )


def kmv_distinct_sql(
    table_sql: str,
    key_sql: str,
    group_sql: tuple[str, ...] = (),
    k: int = 64,
    salt: str = "kmv",
) -> str:
    """The DuckDB oracle for :func:`kmv_distinct`, generated so entry
    modules never hand-copy the estimator formula."""
    groups = ", ".join(group_sql)
    gsel = f"{groups}, " if groups else ""
    gby = f"GROUP BY {groups}" if groups else ""
    part = f"PARTITION BY {groups} " if groups else ""
    return f"""
WITH hashed AS (
  SELECT DISTINCT {gsel}
    ('0x' || substr(md5('{salt}' || CAST({key_sql} AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM {table_sql}
),
kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER ({part}ORDER BY h) AS rn FROM hashed
  ) WHERE rn <= {k}
)
SELECT {gsel}COUNT(*) AS n_kept,
       ROUND(CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(k - 1)} / (MAX(h) / {_SPACE}) END, 6)
         AS est_distinct
FROM kept {gby}
"""
