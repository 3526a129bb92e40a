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
