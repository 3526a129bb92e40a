"""Blackbox reliability / performance calculators.

Reference: continuous canary probes —
  reliability_calculator.go:27-80  — emit 1 pt/s magic metrics, then
      reliability = received / expected over a 10 m window (20 m lag)
  performance_calculator.go:55-71 — latency of the heaviest supported scan,
      `sum(count_over_time(canary[1w]))`, reported each minute.

Same math over the samples store; useful as a continuous smoke of the whole
ingest→store→query loop.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame

from metric_store_release_spark.engine.engine import PromQLEngine


def reliability(
    engine: PromQLEngine,
    samples: DataFrame,
    canary_name: str,
    at_ms: int,
    window_ms: int = 10 * 60_000,
    lag_ms: int = 20 * 60_000,
    emission_interval_ms: int = 1_000,
) -> float:
    """received/expected of 1 pt/interval canaries over the window."""
    end = at_ms - lag_ms
    expected = window_ms / emission_interval_ms
    got = engine.query_instant(
        samples, f"sum(count_over_time({canary_name}[{window_ms}ms]))", end
    ).collect()
    received = got[0]["value"] if got else 0.0
    return received / expected


def performance_probe(
    engine: PromQLEngine, samples: DataFrame, canary_name: str, at_ms: int,
    window: str = "1w",
) -> tuple[float, float]:
    """(latency_seconds, value) of the 1-week count_over_time scan."""
    t0 = time.perf_counter()
    rows = engine.query_instant(
        samples, f"sum(count_over_time({canary_name}[{window}]))", at_ms
    ).collect()
    latency = time.perf_counter() - t0
    return latency, rows[0]["value"] if rows else 0.0
