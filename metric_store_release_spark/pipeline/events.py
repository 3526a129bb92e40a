"""Event-stream analytics operators: sessionization and as-of join.

Both are single-shuffle designs keyed by the (uniform) user column:

  - sessionize: the classic gap-based session split. One shuffle + one
    sort per user; the boundary flag, session number and per-session
    aggregate all reuse the same window partitioning, so Spark plans ONE
    Exchange + ONE Sort for the whole pipeline.
  - asof_join: "for each left event, the most recent right event at or
    before it". Implemented with the union-tag trick instead of a range
    join: tag both sides, union, sort per key by (ts, side), and carry the
    last non-null right value forward with last_value(ignoreNulls). No
    join node at all — one shuffle of left+right, one sort, map-side
    projection; immune to the range-join blowup and to right-side skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps
    > ``gap_ms``; return one row per session with start/end/count/sum.

    Ordering ties break on ``id_col`` so the split is deterministic even
    with duplicate timestamps. Plan: one Exchange keyed by user, one Sort
    by (ts, id) reused by both window functions, then a hash aggregation
    on (user, session_seq) that arrives pre-partitioned — no second
    shuffle of the event stream.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    prev_ts = F.lag(ts_col).over(w)
    boundary = F.when(
        prev_ts.isNull() | (F.col(ts_col) - prev_ts > gap_ms), 1
    ).otherwise(0)
    seq = F.sum(boundary).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("session_seq", seq)
        .groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start_ms"),
            F.max(ts_col).alias("session_end_ms"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    window_ms: int,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts_ms",
) -> DataFrame:
    """Ordered-funnel conversion: how many users performed ``steps`` in
    order, all within ``window_ms`` of their FIRST step-0 event.

    Semantics: t0 = the user's earliest step-0 event; each later step k
    needs an event at-or-after the user's step-(k-1) completion time and
    no later than t0 + window. Earliest-qualifying times are used at every
    level, which maximizes conversion (the standard greedy funnel).

    Plan shape: one filtered aggregation per step keyed by the (uniform)
    user column, chained by per-user equi-joins — len(steps) small
    shuffles over only that step's events, no windows over the full
    stream, no cross-step data movement beyond the per-user frontier
    table (one row per surviving user). Output: (step_index, step,
    n_users), built as a union of 1-row aggregates.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    first = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
        .withColumn("__deadline", F.col("__t") + F.lit(window_ms))
    )
    frontier = first
    counts = [
        frontier.agg(
            F.lit(1).alias("step_index"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
    ]
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(frontier, user_col)
            .filter(
                (F.col(ts_col) >= F.col("__t"))
                & (F.col(ts_col) <= F.col("__deadline"))
            )
            .groupBy(user_col)
            .agg(
                F.min(ts_col).alias("__t"),
                F.first("__deadline").alias("__deadline"),
            )
        )
        frontier = nxt
        counts.append(
            frontier.agg(
                F.lit(k).alias("step_index"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def ab_test_conversion(
    df: DataFrame,
    convert: Column,
    user_col: str = "user_id",
    salt: str = "ab",
) -> DataFrame:
    """Two-variant experiment readout: deterministic 50/50 user split by
    the shared md5 hash (so assignment is stable across reruns and
    engines — the hash_bucket contract), per-variant conversion rates,
    and the pooled two-proportion z-score — the quantity an A/B decision
    reads first. ``convert`` is any row-level predicate; a user counts
    as converted if ANY of their rows satisfies it.

    Plan: ONE hash aggregation per user (map-side partials carry the
    or-fold), then a single-row conditional aggregation over variants —
    no joins, no windows, scale-independent output. Returns one row
    (n_a, conv_a, rate_a, n_b, conv_b, rate_b, z_score), floats rounded
    6 (z from exact integer counts, so any engine reproduces it)."""
    from metric_store_release_spark.pipeline.text import hash_bucket

    users = df.groupBy(user_col).agg(
        F.max(F.when(convert, 1).otherwise(0)).alias("__conv")
    )
    assigned = users.withColumn(
        "__v", F.pmod(hash_bucket(F.col(user_col), salt), F.lit(2))
    )
    agg = assigned.agg(
        F.sum(F.when(F.col("__v") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("__v") == 0, F.col("__conv")).otherwise(0)).alias(
            "conv_a"
        ),
        F.sum(F.when(F.col("__v") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("__v") == 1, F.col("__conv")).otherwise(0)).alias(
            "conv_b"
        ),
    )
    na, ca = F.col("n_a").cast("double"), F.col("conv_a").cast("double")
    nb, cb = F.col("n_b").cast("double"), F.col("conv_b").cast("double")
    # an EMPTY variant (tiny or pre-filtered input can hash everyone to
    # one arm) has no defined rate — NULL, not an ANSI /0 error; the
    # same guard shape as the degenerate-se z below
    pa = F.when(na > 0.0, ca / na)
    pb = F.when(nb > 0.0, cb / nb)
    pooled = F.when((na > 0.0) & (nb > 0.0), (ca + cb) / (na + nb))
    se = F.sqrt(pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb))
    # a degenerate experiment (everyone or no one converted) has se = 0
    # and no defined z — NULL, not a division error (ANSI mode raises on
    # double /0 too); an empty variant makes se NULL, same outcome
    z = F.when(se > 0.0, F.round((pa - pb) / se, 6))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("conv_a").cast("long").alias("conv_a"),
        F.round(pa, 6).alias("rate_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round(pb, 6).alias("rate_b"),
        z.alias("z_score"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts_ms",
    id_col: str = "event_id",
    right_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gains the most recent right row
    with the same ``on`` key and right.ts <= left.ts (inclusive).

    Union-tag formulation: right rows sort BEFORE left rows at equal
    timestamps (side 0 < 1), equal (ts, side) ties break on ``id_col``,
    and ``last_value(..., ignoreNulls)`` carries the latest right payload
    forward onto every left row. Rows with no prior right match keep
    nulls. Output: every left column plus ``prefix + ts_col`` and
    ``prefix + c`` for each requested right column.
    """
    carried = [ts_col, *right_cols]
    l = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(left.dtypes + right.dtypes)[c]).alias(f"__r_{c}") for c in carried],
    )
    r = right.select(
        F.col(on),
        F.col(ts_col),
        F.col(id_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
    )
    # align schemas: left keeps all its columns; right fills the rest null
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*l.columns)
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("__side"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned.select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True)
            .over(w)
            .alias(f"{prefix}{c}")
            for c in carried
        ],
    )
    return out.filter(F.col("__side") == 1).drop(
        "__side", *[f"__r_{c}" for c in carried]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts_ms",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    on: str | None = "user_id",
    bucket_width: int = 3_600_000,
    how: str = "inner",
) -> DataFrame:
    """Range join (point IN [start, end], both ends inclusive) as a plain
    equi-join via bucket decomposition.

    The declarative form (``p.ts BETWEEN i.start AND i.end``) gives Spark
    only a non-equi predicate, so Catalyst plans BroadcastNestedLoopJoin —
    O(|points| x |intervals|) work and an unbounded broadcast: a
    scale-killer for any real interval table. Decomposition restores an
    equi-key: each interval explodes to the buckets of width
    ``bucket_width`` it covers (fan-out = len/width + 1, bounded by
    construction), each point maps to its single bucket, and the join runs
    on (key..., bucket) through the ordinary shuffle/broadcast machinery —
    AQE free to pick, skew-splittable, no nested loop. The exact BETWEEN
    predicate then filters the per-bucket candidates.

    ``on``: optional extra equi-key (e.g. user) — with it the bucket is a
    refinement of an already-equi join key and the fan-out just trims the
    per-key cross product. ``bucket_width`` tunes fan-out vs selectivity:
    ~the typical interval length is right (1 explode row per interval,
    candidates within one bucket of the match).

    ``how``: 'inner' or 'left' (left keeps unmatched points with null
    interval columns; matched-in-several-intervals points duplicate, as a
    range join must).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    w = int(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor(F.col(end_col) / w).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point_col) / w).cast("long"))
    keys = ["__bucket"] if on is None else [on, "__bucket"]
    joined = pt.join(iv, keys, "inner").filter(
        F.col(point_col).between(F.col(start_col), F.col(end_col))
    )
    if how == "left":
        matched = joined.drop("__bucket")
        iv_cols = [c for c in matched.columns if c not in points.columns]
        # null-safe anti-join: plain column equality drops NULL point rows
        # from the anti side (NULL != NULL), emitting a matched row a second
        # time as a spurious null-extended miss. Rename the match-side keys
        # and compare with <=> so NULLs pair up.
        match_keys = joined.select(
            *[F.col(c).alias(f"__m_{c}") for c in points.columns]
        ).distinct()
        anti_cond = None
        for c in points.columns:
            eq = F.col(c).eqNullSafe(F.col(f"__m_{c}"))
            anti_cond = eq if anti_cond is None else (anti_cond & eq)
        misses = pt.drop("__bucket").join(match_keys, anti_cond, "left_anti")
        for c in iv_cols:
            misses = misses.withColumn(c, F.lit(None).cast(dict(matched.dtypes)[c]))
        return matched.unionByName(misses)
    return joined.drop("__bucket")


def percentiles_distributed(
    df: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """EXACT interpolated percentiles (ANSI quantile_cont) per key via a
    value-DISTRIBUTION table — the skew-safe form of the buffered
    `F.percentile` aggregation.

    Why: `F.percentile` is a buffering TypedImperativeAggregate — every
    raw value of a group ends up in one reducer's buffer. With few, hot
    keys (this table: ~10 event types) that is the textbook skew/OOM
    shape at warehouse scale: a 100 TB corpus puts billions of doubles
    in one buffer. Metric values are finite-precision (this fixture:
    2 dp), so the distribution table (key, value, count) SATURATES at
    |keys| x |value grid| rows no matter how large the corpus grows:

      1. hash-aggregate to (key, value, n) — map-side combine collapses
         duplicate values before the shuffle, keys are (key, value) so
         hot keys spread across reducers;
      2. one window pass per key over the BOUNDED distribution table
         (running count + total — a per-key sort of <= |value grid|
         rows, not of raw data);
      3. the q-th percentile reads the two straddling values of rank
         q*(N-1): v_lo + frac * (v_hi - v_lo), the same interpolation
         `F.percentile` and DuckDB `quantile_cont` use, so results are
         identical to the buffered form.

    Output: one row per key with a ROUND(.., 6) column per q named
    p50/p90/p99-style (`p{int(q*100)}`).
    """
    d = df.groupBy(key_col, value_col).agg(F.count(F.lit(1)).alias("n"))
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(key_col)
    dd = d.select(
        key_col,
        value_col,
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    # 0-based fractional rank of quantile q over N sorted values is
    # q*(N-1); the value covering 0-based positions [cum-n, cum-1] is
    # the straddle-min with cum >= pos+1.
    cols = [key_col, value_col, "cum", "total"]
    marks = {}
    for q in qs:
        rank0 = F.lit(q) * (F.col("total") - 1).cast("double")
        marks[q] = (
            F.col("cum") >= F.floor(rank0) + 1,
            F.col("cum") >= F.ceil(rank0) + 1,
        )
    aggs = []
    for q in qs:
        lo_flag, hi_flag = marks[q]
        v_lo = F.min(F.when(lo_flag, F.col(value_col)))
        v_hi = F.min(F.when(hi_flag, F.col(value_col)))
        rank0 = F.lit(q) * (F.max("total") - 1).cast("double")
        frac = rank0 - F.floor(rank0)
        aggs.append(
            F.round(v_lo + frac * (v_hi - v_lo), 6).alias(f"p{int(q * 100)}")
        )
    return dd.select(*cols).groupBy(key_col).agg(*aggs)
