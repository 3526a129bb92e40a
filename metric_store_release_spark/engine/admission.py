"""Query admission limits — the reference's production envelope.

The reference gates every query through a MaxSamples cap (20e6), a query
timeout and a concurrent-query tracker (src/internal/metric-store/
metric_store.go:295-303, vendor promql/engine.go:576-648 ActiveQueryTracker).
Spark analog:

  - **max samples**: before planning, estimate how many sample rows the
    query's selectors will fan out onto the step grid — one cheap
    column-pruned count per selector (the same pushed-down parquet scan the
    real query uses, reading only `ts`) with the per-sample servable-step
    arithmetic of `selectors._explode_to_steps`. This counts the engine's
    scan fan-out, which upper-bounds the reference's per-step loaded-sample
    count. Over the cap → typed QueryLimitError before any heavy work.
  - **timeout / concurrency**: plans are lazy, so wall-clock enforcement
    lives at execution: `PromQLEngine.execute` wraps the action in a Spark
    job group cancelled by a timer, behind a non-blocking semaphore.

The estimate deliberately ignores subquery re-evaluation multiplicity
(bounds are widened by the subquery range instead) — it is a guard, not an
accountant.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metric_store_release_spark.engine.evaluator import PromQLEvalError
from metric_store_release_spark.engine.selectors import base_scan
from metric_store_release_spark.promql import ast
from metric_store_release_spark.promql.ast import (
    AggregateExpr,
    BinaryExpr,
    Call,
    MatrixSelector,
    ParenExpr,
    SubqueryExpr,
    UnaryExpr,
    VectorSelector,
)


class QueryLimitError(PromQLEvalError):
    """Query rejected by an admission limit (max samples / concurrency)."""


class QueryTimeoutError(PromQLEvalError):
    """Query cancelled after exceeding the configured timeout."""


def _selector_scans(
    node: ast.Node, lookback_ms: int, extra_before: int = 0
) -> Iterator[tuple[VectorSelector, int, int]]:
    """Yield (selector, window_ms, extra_scan_before_ms) for every selector.

    A matrix selector loads its range window; a bare vector selector loads
    the lookback window. Selectors under a subquery scan wider (the subquery
    range + offset is added to the bounds).
    """
    if isinstance(node, MatrixSelector):
        yield node.selector, node.range_ms, extra_before
        return
    if isinstance(node, VectorSelector):
        yield node, lookback_ms, extra_before
        return
    if isinstance(node, SubqueryExpr):
        yield from _selector_scans(
            node.expr, lookback_ms, extra_before + node.range_ms + abs(node.offset_ms)
        )
        return
    children: list[ast.Node] = []
    if isinstance(node, Call):
        children = node.args
    elif isinstance(node, AggregateExpr):
        children = [node.expr] + ([node.param] if node.param else [])
    elif isinstance(node, BinaryExpr):
        children = [node.lhs, node.rhs]
    elif isinstance(node, (UnaryExpr, ParenExpr)):
        children = [node.expr]
    for c in children:
        yield from _selector_scans(c, lookback_ms, extra_before)


def estimate_query_samples(
    samples: DataFrame,
    node: ast.Node,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int,
) -> int:
    """Total step-grid sample fan-out across the query's selectors.

    All selectors' counts are unioned into ONE aggregation plan so the
    estimate costs a single Spark job regardless of how many selectors the
    query has.
    """
    n_steps = (end_ms - start_ms) // step_ms
    parts: list[DataFrame] = []
    for sel, window_ms, extra in _selector_scans(node, lookback_ms):
        at = sel.at_ms
        if sel.at_preprocessor == "start":
            at = start_ms
        elif sel.at_preprocessor == "end":
            at = end_ms
        if at is not None:
            lo = at - sel.offset_ms - window_ms - extra
            hi = at - sel.offset_ms
            # an @-pinned selector serves the same window to every step
            per_sample = F.lit(n_steps + 1)
        else:
            lo = start_ms - window_ms - extra - max(sel.offset_ms, 0)
            hi = end_ms + max(-sel.offset_ms, 0)
            shifted = F.col("ts") + F.lit(sel.offset_ms)
            k0 = F.greatest(
                F.lit(0),
                F.ceil((shifted - F.lit(start_ms)) / F.lit(step_ms)).cast("long"),
            )
            k1 = F.least(
                F.lit(n_steps),
                F.floor(
                    (shifted + F.lit(window_ms) - F.lit(start_ms)) / F.lit(step_ms)
                ).cast("long"),
            )
            per_sample = F.when(k1 >= k0, k1 - k0 + 1).otherwise(F.lit(0))
        scan = base_scan(samples, sel, lo, hi)
        parts.append(scan.select(per_sample.cast("long").alias("n")))
    if not parts:
        return 0
    row = _union_all(parts).select(F.sum("n").alias("n")).first()
    return int(row["n"] or 0)


def _union_all(parts: list[DataFrame]) -> DataFrame:
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned


#: marker embedded in the lazy guard's failure message so execute() can
#: re-raise the Spark runtime error as a typed QueryLimitError
GUARD_MESSAGE = "MaxSamples admission limit exceeded"


#: (samples plan semantic hash, selector name key, lo, hi) → scan row count.
#: Caches the one count job a parquet-backed bound needs, reused across
#: queries over the same underlying table (bench, API serving).
_scan_count_cache: dict[tuple, int] = {}


def _plan_row_count(df: DataFrame) -> int | None:
    """Optimizer-known exact row count (LocalRelation / cached relation) —
    free, no job. None when the plan's stats don't carry one (parquet)."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        return None
    return None


def static_sample_bound(
    samples: DataFrame,
    node: ast.Node,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int,
) -> int | None:
    """Cheap UPPER bound on the query's step-grid fan-out, or None.

    Admission at 100 TB cannot afford a scan per query just to decide
    admission: this bounds fan-out as (scan row upper bound) × (worst-case
    steps each sample can serve). Row bound comes free from optimizer stats
    when the source is a local/cached relation (every unit test), else from
    ONE column-pruned pushed-filter count per (table, selector name, bounds)
    — cached, so repeated queries over the same table (the serving pattern)
    pay zero. If the bound is ≤ the cap the in-plan guard is skipped
    entirely; otherwise the exact in-plan guard decides (and aborts like the
    reference's ErrTooManySamples). Returns None if no bound is computable.
    """
    n_steps = (end_ms - start_ms) // step_ms
    whole_rows = _plan_row_count(samples)
    total = 0
    for sel, window_ms, extra in _selector_scans(node, lookback_ms):
        if sel.at_ms is not None or sel.at_preprocessor:
            per_sample = n_steps + 1
        else:
            per_sample = min(n_steps, (window_ms + extra) // step_ms + 2) + 1
        if whole_rows is not None:
            rows = whole_rows
        else:
            lo = start_ms - window_ms - extra - abs(sel.offset_ms)
            hi = end_ms + abs(sel.offset_ms)
            # count with ONLY the name matchers: an upper bound for any
            # matcher set on that name, so the cache key stays small and
            # one count serves every label-filter variation over the table
            name_matchers = [m for m in sel.matchers if m.name == "__name__"]
            stripped = VectorSelector(name=sel.name, matchers=name_matchers)
            try:
                key = (
                    samples.semanticHash(),
                    sel.name,
                    tuple((m.op.value, m.value) for m in name_matchers),
                    lo,
                    hi,
                )
            except Exception:
                return None
            if key not in _scan_count_cache:
                _scan_count_cache[key] = base_scan(samples, stripped, lo, hi).count()
            rows = _scan_count_cache[key]
        total += rows * per_sample
    return total


def attach_sample_guard(
    result: DataFrame,
    samples: DataFrame,
    node: ast.Node,
    start_ms: int,
    end_ms: int,
    step_ms: int,
    lookback_ms: int,
    max_samples: int,
) -> DataFrame:
    """Enforce the MaxSamples cap INSIDE the query plan (no extra job).

    The selectors' fan-out totals aggregate to one row that survives a
    filter iff the total is under the cap (assert_true aborts the query
    otherwise — the reference also aborts during evaluation,
    engine.go:1713-1717 ErrTooManySamples). That row is cross-joined
    (broadcast, 1 row) onto the result, so the guard executes with the
    query action itself; the guard's scan subtree is column-pruned to the
    selector filter columns and runs in parallel with the main plan.
    """
    n_steps = (end_ms - start_ms) // step_ms
    parts: list[DataFrame] = []
    for sel, window_ms, extra in _selector_scans(node, lookback_ms):
        at = sel.at_ms
        if sel.at_preprocessor == "start":
            at = start_ms
        elif sel.at_preprocessor == "end":
            at = end_ms
        if at is not None:
            lo = at - sel.offset_ms - window_ms - extra
            hi = at - sel.offset_ms
            per_sample = F.lit(n_steps + 1)
        else:
            lo = start_ms - window_ms - extra - max(sel.offset_ms, 0)
            hi = end_ms + max(-sel.offset_ms, 0)
            shifted = F.col("ts") + F.lit(sel.offset_ms)
            k0 = F.greatest(
                F.lit(0),
                F.ceil((shifted - F.lit(start_ms)) / F.lit(step_ms)).cast("long"),
            )
            k1 = F.least(
                F.lit(n_steps),
                F.floor(
                    (shifted + F.lit(window_ms) - F.lit(start_ms)) / F.lit(step_ms)
                ).cast("long"),
            )
            per_sample = F.when(k1 >= k0, k1 - k0 + 1).otherwise(F.lit(0))
        scan = base_scan(samples, sel, lo, hi)
        parts.append(scan.select(per_sample.cast("long").alias("n")))
    if not parts:
        return result
    total = _union_all(parts).select(
        F.coalesce(F.sum("n"), F.lit(0)).alias("n")
    )
    # the filter's cardinality depends on the assertion, so Catalyst cannot
    # prune it; one row survives iff under the cap
    guard = total.filter(
        F.assert_true(
            F.col("n") <= F.lit(max_samples),
            F.concat(
                F.lit(f"{GUARD_MESSAGE}: query fans out "),
                F.col("n").cast("string"),
                F.lit(f" samples onto the step grid (cap {max_samples}, "
                      "metric_store.go:296)"),
            ),
        ).isNull()
    ).select(F.lit(True).alias("__adm"))
    return result.crossJoin(F.broadcast(guard)).drop("__adm")
