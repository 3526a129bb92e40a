"""Randomized event-operator semantics: sessionize and asof_join vs
straight-line Python references on seeded random event streams.

Complements the hand-computed cases and the DuckDB oracles (one fixed
dataset) with a sweep over many random shapes — duplicate timestamps,
singleton users, empty right sides, gap-boundary adjacency.
"""

from __future__ import annotations

import random

from metric_store_release_spark.pipeline.events import asof_join, sessionize


def _random_events(rng: random.Random, n_users: int, n_events: int):
    rows = []
    for eid in range(n_events):
        rows.append(
            (
                eid,
                rng.randrange(n_users),
                rng.randrange(0, 5_000) * 100,  # coarse grid -> ts collisions
                float(rng.randrange(0, 100)),
            )
        )
    return rows


def _sessions_ref(rows, gap_ms):
    """Pure-Python sessionize: per user sort by (ts, id), split on gap."""
    by_user: dict = {}
    for eid, u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, eid, v))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        prev = None
        for ts, eid, v in evs:
            if prev is None or ts - prev > gap_ms:
                seq += 1
                out[(u, seq)] = [ts, ts, 0, 0.0]
            s = out[(u, seq)]
            s[1] = ts
            s[2] += 1
            s[3] += v
            prev = ts
    return {
        k: (v[0], v[1], v[2], round(v[3], 6)) for k, v in out.items()
    }


def test_sessionize_matches_python_reference(spark):
    rng = random.Random(7)
    for trial in range(3):
        rows = _random_events(rng, n_users=5, n_events=120)
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts_ms long, value double"
        )
        gap = rng.choice([1_000, 10_000, 60_000])
        got = {
            (r["user_id"], r["session_seq"]): (
                r["session_start_ms"],
                r["session_end_ms"],
                r["n_events"],
                r["sum_value"],
            )
            for r in sessionize(df, gap_ms=gap).collect()
        }
        assert got == _sessions_ref(rows, gap), f"trial {trial} gap {gap}"


def _asof_ref(left, right):
    """Pure-Python backward as-of: latest right with (ts, id)-order key
    at-or-before each left row, same-key ties broken like the operator
    (right sorts before left at equal ts; right ties on larger id win)."""
    by_user: dict = {}
    for eid, u, ts, v in right:
        by_user.setdefault(u, []).append((ts, eid, v))
    for evs in by_user.values():
        evs.sort()
    out = {}
    for eid, u, ts, v in left:
        best = None
        for rts, rid, rv in by_user.get(u, []):
            if rts <= ts:
                best = (rts, rv)
            else:
                break
        out[eid] = best
    return out


def test_asof_join_matches_python_reference(spark):
    rng = random.Random(11)
    for trial in range(3):
        left = _random_events(rng, n_users=4, n_events=60)
        right = [
            (eid + 10_000, u, ts, v)
            for eid, u, ts, v in _random_events(rng, n_users=4, n_events=60)
        ]
        ldf = spark.createDataFrame(
            left, "event_id long, user_id long, ts_ms long, value double"
        )
        rdf = spark.createDataFrame(
            right, "event_id long, user_id long, ts_ms long, value double"
        )
        got = {
            r["event_id"]: (
                None
                if r["asof_ts_ms"] is None
                else (r["asof_ts_ms"], r["asof_value"])
            )
            for r in asof_join(ldf, rdf).collect()
        }
        assert got == _asof_ref(left, right), f"trial {trial}"


def _funnel_ref(rows, steps, window_ms):
    """Pure-Python greedy funnel."""
    by_user: dict = {}
    for eid, u, typ, ts in rows:
        by_user.setdefault(u, []).append((ts, typ))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        evs.sort()
        firsts = [t for t, typ in evs if typ == steps[0]]
        if not firsts:
            continue
        t = min(firsts)
        deadline = t + window_ms
        counts[0] += 1
        for k, step in enumerate(steps[1:], start=1):
            nxt = [ts for ts, typ in evs if typ == step and t <= ts <= deadline]
            if not nxt:
                break
            t = min(nxt)
            counts[k] += 1
    return {k + 1: c for k, c in enumerate(counts) if c}


def test_funnel_matches_python_reference(spark):
    from metric_store_release_spark.pipeline.events import funnel

    rng = random.Random(23)
    steps = ["a", "b", "c"]
    for trial in range(3):
        rows = [
            (
                eid,
                rng.randrange(6),
                rng.choice(steps + ["x"]),
                rng.randrange(0, 500) * 100,
            )
            for eid in range(150)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts_ms long"
        )
        window = rng.choice([5_000, 20_000])
        got = {
            r["step_index"]: r["n_users"]
            for r in funnel(df, steps, window).collect()
            if r["n_users"] > 0
        }
        assert got == _funnel_ref(rows, steps, window), f"trial {trial}"


def _interval_ref(points, intervals):
    """Naive O(n*m) range-join reference."""
    out = []
    for (u, ts, pid) in points:
        for (iu, lo, hi, iid) in intervals:
            if u == iu and lo <= ts <= hi:
                out.append((u, ts, pid, lo, hi, iid))
    return sorted(out)


def test_interval_join_matches_naive_reference(spark):
    from metric_store_release_spark.pipeline.events import interval_join

    rng = random.Random(7)
    points = [
        (rng.randrange(4), rng.randrange(0, 10_000), pid) for pid in range(300)
    ]
    intervals = []
    for iid in range(60):
        lo = rng.randrange(0, 9_000)
        intervals.append((rng.randrange(4), lo, lo + rng.randrange(0, 2_000), iid))
    p = spark.createDataFrame(points, "user_id int, ts_ms long, pid int")
    iv = spark.createDataFrame(
        intervals, "user_id int, start_ms long, end_ms long, iid int"
    )
    # bucket width deliberately much smaller than interval spans: correctness
    # must not depend on the fan-out tuning
    for width in (100, 1_000, 50_000):
        got = sorted(
            (r["user_id"], r["ts_ms"], r["pid"], r["start_ms"], r["end_ms"], r["iid"])
            for r in interval_join(p, iv, bucket_width=width).collect()
        )
        assert got == _interval_ref(points, intervals)


def test_interval_join_left_keeps_unmatched_points(spark):
    from metric_store_release_spark.pipeline.events import interval_join

    p = spark.createDataFrame(
        [(1, 50, 0), (1, 500, 1), (2, 50, 2)], "user_id int, ts_ms long, pid int"
    )
    iv = spark.createDataFrame(
        [(1, 0, 100, 10), (1, 40, 60, 11)],
        "user_id int, start_ms long, end_ms long, iid int",
    )
    out = interval_join(p, iv, bucket_width=64, how="left").collect()
    by_pid: dict = {}
    for r in out:
        by_pid.setdefault(r["pid"], []).append(r["iid"])
    # pid 0 matches BOTH overlapping intervals (a range join must duplicate)
    assert sorted(by_pid[0]) == [10, 11]
    # pids 1 and 2 keep one null-extended row each
    assert by_pid[1] == [None] and by_pid[2] == [None]
    # boundary inclusivity: point exactly at start and at end both match
    edge = spark.createDataFrame([(1, 0, 0), (1, 100, 1)], "user_id int, ts_ms long, pid int")
    got = interval_join(edge, iv.filter("iid = 10"), bucket_width=64).collect()
    assert sorted(r["pid"] for r in got) == [0, 1]


def test_interval_join_left_null_payload_not_duplicated(spark):
    """ADVICE r5 (medium): a point row with a NULL payload column that DOES
    match an interval must not also be emitted as a null-extended miss —
    the anti-join must be null-safe."""
    from metric_store_release_spark.pipeline.events import interval_join

    p = spark.createDataFrame(
        [(1, 50, None), (1, 500, None), (2, 50, "x")],
        "user_id int, ts_ms long, payload string",
    )
    iv = spark.createDataFrame(
        [(1, 0, 100, 10)], "user_id int, start_ms long, end_ms long, iid int"
    )
    out = interval_join(p, iv, bucket_width=64, how="left").collect()
    rows = sorted((r["user_id"], r["ts_ms"], r["payload"], r["iid"]) for r in out)
    # exactly 3 rows: the NULL-payload match appears ONCE (iid=10), the
    # other two points appear once each as null-extended misses
    assert rows == [(1, 50, None, 10), (1, 500, None, None), (2, 50, "x", None)]


def test_interval_join_plans_no_nested_loop(spark):
    from metric_store_release_spark.pipeline.events import interval_join

    p = spark.createDataFrame([(1, 5, 0)], "user_id int, ts_ms long, pid int")
    iv = spark.createDataFrame(
        [(1, 0, 10, 0)], "user_id int, start_ms long, end_ms long, iid int"
    )
    plan = (
        interval_join(p, iv, bucket_width=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ab_test_conversion_counts_and_degenerate_guard(spark):
    from pyspark.sql import functions as F

    from metric_store_release_spark.pipeline.events import ab_test_conversion

    rows = [(u, "purchase" if u % 3 == 0 else "view") for u in range(200)]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = ab_test_conversion(df, F.col("event_type") == "purchase").collect()[0]
    # every user lands in exactly one variant
    assert out["n_a"] + out["n_b"] == 200
    assert out["conv_a"] + out["conv_b"] == len(
        {u for u in range(200) if u % 3 == 0}
    )
    assert out["z_score"] is not None
    # deterministic: identical rerun
    again = ab_test_conversion(df, F.col("event_type") == "purchase").collect()[0]
    assert again.asDict() == out.asDict()
    # degenerate (everyone converts): z is NULL, not a division error
    allconv = ab_test_conversion(df, F.lit(True)).collect()[0]
    assert allconv["z_score"] is None
    assert allconv["rate_a"] == 1.0 and allconv["rate_b"] == 1.0
