"""Nozzle: envelope streams → points (reference: src/internal/nozzle/).

The reference consumes Loggregator envelopes (gauges, counters, timers) and
converts them to storage points (nozzle.go:230-400). Here envelopes are rows
of a DataFrame — batch or Structured Streaming, the same transformations
apply (micro-batches stand in for the reference's 500 ms / 32 KiB batching,
batcher.go:10-60; backpressure is the source's maxOffsetsPerTrigger instead
of drop-on-overflow diodes, nozzle.go:93-101).

Envelope schema (one row per envelope):

    ts        long   envelope timestamp, epoch ns (Loggregator convention)
    source_id string
    type      string 'gauge' | 'counter' | 'timer'
    name      string counter/timer name
    total     double counter running total
    gauges    map<string, struct<unit string, value double>>
    start     long   timer start ns
    stop      long   timer stop ns
    tags      map<string,string>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from metric_store_release_spark.datamodel import (
    sanitize_metric_name,
    truncate_label_values,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("ts", LongType(), False),
        StructField("source_id", StringType(), False),
        StructField("type", StringType(), False),
        StructField("name", StringType(), True),
        StructField("total", DoubleType(), True),
        StructField(
            "gauges",
            MapType(
                StringType(),
                StructType(
                    [
                        StructField("unit", StringType(), True),
                        StructField("value", DoubleType(), True),
                    ]
                ),
            ),
            True,
        ),
        StructField("start", LongType(), True),
        StructField("stop", LongType(), True),
        StructField("tags", MapType(StringType(), StringType()), True),
    ]
)


def _finite(value):
    return ~F.isnan(value) & (value != float("inf")) & (value != float("-inf"))


def gauges_to_points(envelopes: DataFrame) -> DataFrame:
    """One point per gauge metric (nozzle.go:346-376): labels = tags +
    source_id + unit; NaN/Inf rejected (transform.IsValidFloat,
    point_translator.go:99-101)."""
    g = envelopes.filter(F.col("type") == "gauge").select(
        (F.col("ts") / 1_000_000).cast("long").alias("ts"),
        "source_id",
        "tags",
        F.explode("gauges").alias("gname", "g"),
    )
    labels = F.map_concat(
        F.map_filter(
            F.coalesce(F.col("tags"), F.expr("map()")),
            lambda k, _: ~k.isin("source_id", "unit"),
        ),
        F.create_map(F.lit("source_id"), F.col("source_id")),
        F.map_filter(
            F.create_map(F.lit("unit"), F.col("g.unit")), lambda _, v: v.isNotNull()
        ),
    )
    return g.filter(_finite(F.col("g.value"))).select(
        "ts",
        sanitize_metric_name(F.col("gname")).alias("name"),
        F.col("g.value").alias("value"),
        truncate_label_values(labels).alias("labels"),
    )


def counters_to_points(envelopes: DataFrame) -> DataFrame:
    """Counter envelope → cumulative total as float (nozzle.go:378-400)."""
    c = envelopes.filter(F.col("type") == "counter")
    labels = F.map_concat(
        F.map_filter(
            F.coalesce(F.col("tags"), F.expr("map()")),
            lambda k, _: k != F.lit("source_id"),
        ),
        F.create_map(F.lit("source_id"), F.col("source_id")),
    )
    return c.filter(F.col("total").isNotNull()).select(
        (F.col("ts") / 1_000_000).cast("long").alias("ts"),
        sanitize_metric_name(F.col("name")).alias("name"),
        F.col("total").alias("value"),
        truncate_label_values(labels).alias("labels"),
    )


def envelopes_to_points(envelopes: DataFrame) -> DataFrame:
    """Gauges + counters (timers go through the rollup pipeline instead)."""
    return gauges_to_points(envelopes).unionByName(counters_to_points(envelopes))


class NozzleMetrics:
    """Driver-side drop accounting (NozzleDroppedEnvelopesTotal analog)."""

    def __init__(self) -> None:
        self.dropped_envelopes_total = 0
        self.ingressed_envelopes_total = 0


def load_shed(
    batch: DataFrame, max_rows: int, metrics: NozzleMetrics | None = None
) -> DataFrame:
    """Per-micro-batch load shed: keep the NEWEST `max_rows` envelopes,
    drop (and count) the rest — the OneToOne diode's overwrite-oldest
    behavior (nozzle.go:93-101). The cap is a per-batch memory bound; the
    newest-first ordering matches a ring buffer overwritten by arrivals."""
    total = batch.count()
    if total <= max_rows:
        if metrics is not None:
            metrics.ingressed_envelopes_total += total
        return batch
    kept = batch.orderBy(F.col("ts").desc()).limit(max_rows)
    if metrics is not None:
        metrics.dropped_envelopes_total += total - max_rows
        metrics.ingressed_envelopes_total += max_rows
    return kept


def nozzle_stream(
    spark,
    envelope_dir: str,
    out_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 8,
    shed_above_rows: int | None = None,
    metrics: NozzleMetrics | None = None,
):
    """File-source envelope stream → points → shard store, with enforced
    backpressure: `maxFilesPerTrigger` bounds how much each micro-batch
    admits (the maxOffsetsPerTrigger analog for the file source), and
    `shed_above_rows` drops the oldest envelopes beyond the cap inside
    each batch, counting drops (the nozzle's diode alert). Returns the
    started StreamingQuery."""
    envelopes = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(envelope_dir)
    )

    def emit(batch: DataFrame, batch_id: int) -> None:
        from metric_store_release_spark.sources.storage import write_samples

        if shed_above_rows is not None:
            batch = load_shed(batch, shed_above_rows, metrics)
        elif metrics is not None:
            metrics.ingressed_envelopes_total += batch.count()
        write_samples(envelopes_to_points(batch), out_path)

    return (
        envelopes.writeStream.foreachBatch(emit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
