"""Evaluation result types.

PromQL's four value types (vendor promql/value.go) map to:

  Scalar         → ScalarResult: a Python float when step-invariant, else a
                   DataFrame (t, value) over the step grid
  String         → StringResult (literal)
  Instant vector → VectorResult: DataFrame with columns
                      t         long   step timestamp (ms)
                      labels    map<string,string>  (includes __name__ when set)
                      sig       array<struct<key,value>>  canonical series id
                      value     double
                      sample_ts long   original sample timestamp (selectors
                                       only; used by timestamp())
  Range vector   → RangeFrame (internal to function eval): DataFrame
                      t, sig, labels, ts, value (one row per sample per window)

The step grid is a *column*, not a driver loop: all steps of a range query
evaluate in one Spark job (the reference iterates steps in
promql/engine.go:1112-1311 — rangeEval; making t a grouping column is the
Spark-native equivalent and removes the per-step interpretation overhead).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

VECTOR_COLS = ["t", "labels", "sig", "value"]


@dataclass
class ScalarResult:
    const: float | None = None
    df: DataFrame | None = None  # (t: long, value: double)

    @property
    def is_const(self) -> bool:
        return self.const is not None


@dataclass
class StringResult:
    value: str


@dataclass
class VectorResult:
    df: DataFrame  # t, labels, sig, value [, sample_ts]
    #: presentation ordering from a top-level sort()/sort_desc() — carried
    #: separately so the engine can re-assert it after plan additions (e.g.
    #: the admission guard join) that void SQL ordering guarantees
    order_by: list | None = None


@dataclass
class RangeFrame:
    """Samples grouped into per-step windows, plus window geometry."""

    df: DataFrame  # t, sig, labels, ts, value [, drop, reset, change]
    range_ms: int
    offset_ms: int
    has_order_cols: bool = False
    at_ms: int | None = None  # @-pinned evaluation time (window geometry)
    bucketed: bool = False  # df holds tumbling partials, not raw samples
