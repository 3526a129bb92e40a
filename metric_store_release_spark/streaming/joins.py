"""Stream-stream event-time range join with watermarks.

The remaining Structured Streaming join family: two UNBOUNDED streams
joined on an equi-key plus an event-time range condition (e.g. "each
purchase pairs with the same user's views from the preceding hour").
Spark keeps both sides in the state store and uses the two watermarks +
the time-range predicate to compute how long each side's rows must be
retained — the documented stream-stream join contract. Without the range
condition (or without watermarks on an outer join) state grows forever;
this wrapper makes both mandatory.

Batch equivalence: the SAME function applied to batch DataFrames (where
withWatermark is a no-op) is the plain range join, which is how the test
pins streaming results against the batch answer. For the SCALE shape of
batch range joins, see pipeline.events.interval_join (bucket-decomposed
equi-join); stream-stream joins already hash-partition both sides by the
equi-key, so the state-store lookup IS the bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "r_",
) -> DataFrame:
    """Each left row pairs with every right row of the same ``on`` key
    whose timestamp lies in (left.ts - lookback, left.ts] — one output
    row per qualifying pair (a range join duplicates by design; aggregate
    downstream for "count of views before each purchase" shapes).

    Both inputs need TIMESTAMP event-time columns. On streaming frames
    the watermark bounds state retention on both sides; on batch frames
    withWatermark is a no-op and this is the plain declarative range
    join. Inner join only: outer stream-stream joins emit nulls on
    watermark expiry — different semantics, different operator.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = (
        right.select(
            F.col(on),
            F.col(right_ts),
            *[F.col(c) for c in right_cols],
        )
        .withWatermark(right_ts, watermark)
        .alias("r")
    )
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rts <= lts)
        & (rts > lts - F.expr(f"INTERVAL {lookback}"))
    )
    out = l.join(r, cond, "inner")
    keep = [F.col(f"l.{c}") for c in left.columns]
    keep.append(F.col(f"r.{right_ts}").alias(f"{prefix}{right_ts}"))
    keep.extend(F.col(f"r.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return out.select(*keep)
