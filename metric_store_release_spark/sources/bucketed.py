"""Bucketed table layout: pre-shuffled storage for co-located operations.

At warehouse scale the dominant cost of the pipeline operators is the
shuffle in front of every key-partitioned operation (dedup joins back to
texts, per-user windows, series aggregations). Spark's bucketing
(`bucketBy` + `saveAsTable`) persists the hash-partitioning INTO the table
layout: every reader whose join/aggregation/window key matches the bucket
key gets a `HashPartitioning`-satisfying scan and plans ZERO Exchange for
that stage — the shuffle is paid once at write time and amortized across
every subsequent query.

This is the Spark-native analog of the reference's node-local series
sharding: routing_table.go pins each series to a node so queries read
without cross-node traffic; bucketing pins each key's rows to a bucket
file so operators run without cross-executor traffic.

`tests/test_bucketed.py` pins the evidence: a self-join and a groupBy on
the bucket key plan no Exchange, and a per-user sessionize window over a
user-bucketed events table plans no Exchange (its Sort stays, per-bucket
and local — Spark does not propagate bucket sort order when a bucket
spans multiple files).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: plain identifiers (optionally db-qualified) only: the name is interpolated
#: into DROP TABLE SQL and mapped to a warehouse path, so path separators or
#: `..` in a hostile name would escape the warehouse directory
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed by ``bucket_col``.

    ``n_buckets`` sets write-time parallelism AND the ceiling on read-time
    parallelism for Exchange-free consumers — size it to the target
    cluster (e.g. 2-4x executor count), not the test machine. With
    ``sort_cols`` each bucket FILE is additionally sorted — useful for
    row-group stat pruning; note Spark still plans a (local, per-bucket)
    Sort for ordered consumers when a bucket spans multiple files.
    """
    if not _IDENT.match(table):
        raise ValueError(
            f"table name {table!r} is not a plain (optionally db-qualified) "
            "identifier"
        )
    if mode == "overwrite":
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # an in-memory catalog forgets managed tables between sessions but
        # their warehouse directories survive; clear the orphan location
        # or saveAsTable fails with LOCATION_ALREADY_EXISTS. Only for
        # UNQUALIFIED names in the default database — a qualified name's
        # location lives under <db>.db/ and guessing it risks deleting an
        # unrelated default-db table of the same trailing name.
        if "." not in table:
            import shutil
            from pathlib import Path

            warehouse = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            orphan = (Path(warehouse) / table).resolve()
            # belt-and-braces with the identifier check above: never delete
            # outside the warehouse directory
            if orphan.exists() and orphan.parent == Path(warehouse).resolve():
                shutil.rmtree(orphan)
    w = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the scan carries the bucket distribution so
    matching-key operators downstream plan no Exchange."""
    return spark.table(table)
