"""SparkSession factory with engine-appropriate defaults.

Defaults chosen for the 100 TB design target (AQE on, partition coalescing,
skew-join handling) while remaining correct on local[*] test runs. UTC session
timezone keeps PromQL date functions deterministic (the reference evaluates
date math in UTC — vendor promql/functions.go:1358-1413).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "metric-store-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus)))
        # AQE: runtime re-planning — coalesces small shuffle partitions and
        # splits skewed ones; essential at scale, harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the few mapInPandas paths (scrape I/O, media codecs) —
        # no Python UDFs remain in any query hot path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # some driver testdata generations write TIMESTAMP(NANOS) parquet
        # (read as long ns); current ones are timestamp[us] NTZ — both are
        # handled by sources/events_adapter.ts_ms
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
