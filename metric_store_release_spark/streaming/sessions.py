"""Streaming sessionization: Spark-native session windows with watermark.

The batch counterpart (pipeline.events.sessionize) numbers sessions with a
lag/cumsum window — exact, deterministic, oracle-checkable. This module is
the STREAMING shape of the same semantics: `F.session_window(ts, gap)`
merges events into gap-bounded sessions inside the state store, and a
watermark closes (emits + evicts) a session once the stream's event-time
high-water mark passes session_end + gap. Identical code path runs on a
batch DataFrame (session_window is a regular grouping expression), which
is how the equivalence test pins the two implementations against each
other: same (user, start, end, count, sum) sets on the same input.

Late data: an event older than the watermark is dropped by Spark before
the state store (the documented Structured Streaming contract); an event
inside the watermark that bridges two open sessions MERGES them — the
state-store behavior a hand-rolled lag/cumsum stream could not express
without applyInPandasWithState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(user, session) aggregate via F.session_window.

    ``ts_col`` must be a TIMESTAMP column. On a streaming frame pass
    ``watermark`` (e.g. "1 hour") so state is bounded: sessions close and
    evict once event time passes end + watermark. On a batch frame leave
    it None — all sessions close at the end of input.

    Output: user, session_start, session_end, n_events, sum_value. The
    shuffle key is the (uniform) user column; session merging happens
    inside the state store, so the stream never needs a per-user sort.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def session_stream(
    events: DataFrame,
    sink: list,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    **kwargs,
) -> "object":
    """Run session_aggregate as a Structured Streaming query in APPEND
    mode (the only mode Spark supports for session-window aggregations:
    a session row is final, emitted exactly once when the watermark
    passes session_end + watermark delay — sessions still open at the
    watermark stay in the state store, unemitted). Each micro-batch's
    rows append to ``sink`` (a driver-side list — test harness shape;
    production would writeStream to a table). Returns the StreamingQuery
    handle."""
    agg = session_aggregate(events, gap=gap, watermark=watermark, **kwargs)

    def emit(batch: DataFrame, batch_id: int) -> None:
        sink.extend(batch.collect())

    return (
        agg.writeStream.outputMode("append")
        .foreachBatch(emit)
        .trigger(availableNow=True)
        .start()
    )
