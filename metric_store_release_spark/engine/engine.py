"""PromQLEngine — the public query API.

Mirrors the reference's entry points (vendor promql/engine.go NewInstantQuery
:435 / NewRangeQuery :456, exposed over the Prometheus v1 HTTP API in
src/internal/api/prom_api.go): an instant query is a range query with a
single step. Admission limits (timeout, max-samples) are the caller's
concern here — Spark's own resource management replaces the reference's
ActiveQueryTracker gate (metric_store.go:295-303).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_store_release_spark.datamodel import DEFAULT_LOOKBACK_MS, NAME_LABEL
from metric_store_release_spark.engine.evaluator import (
    EvalContext,
    Evaluator,
    PromQLEvalError,
)
from metric_store_release_spark.engine.results import (
    ScalarResult,
    StringResult,
    VectorResult,
)
from metric_store_release_spark.promql import parse


@dataclass
class EngineConfig:
    lookback_ms: int = DEFAULT_LOOKBACK_MS
    default_subquery_step_ms: int = 60_000
    #: enable the reference's duplicate-series / many-to-many matching
    #: errors (engine.go:2228-2246,2290-2309) as lazy runtime assertions —
    #: off by default since the window count costs a pass over each binop side
    check_matching: bool = False
    #: tumbling-partial (two-level) threshold for sliding range functions;
    #: 0 disables (default). Measured: Spark's map-side partial aggregation
    #: already compresses the window fan-out before the shuffle, so the
    #: explicit two-level plan only helps when partial aggregation cannot —
    #: e.g. extreme range/step with wide value structs; keep it available as
    #: an explicit strategy rather than a default.
    bucketed_range_threshold: int = 0


class PromQLEngine:
    def __init__(self, spark: SparkSession, config: EngineConfig | None = None):
        self.spark = spark
        self.config = config or EngineConfig()

    def query_range(
        self,
        samples: DataFrame,
        promql: str,
        start_ms: int,
        end_ms: int,
        step_ms: int,
    ) -> DataFrame:
        """Evaluate a PromQL range query.

        Returns (t: long, labels: map<string,string>, value: double); the
        metric name, when retained by PromQL semantics, is labels['__name__'].
        """
        if end_ms < start_ms or step_ms <= 0:
            raise ValueError("bad query range")
        node = parse(promql)
        ctx = EvalContext(
            spark=self.spark,
            samples=samples,
            start_ms=start_ms,
            end_ms=end_ms,
            step_ms=step_ms,
            lookback_ms=self.config.lookback_ms,
            default_subquery_step_ms=self.config.default_subquery_step_ms,
            query_start_ms=start_ms,
            query_end_ms=end_ms,
            check_matching=self.config.check_matching,
            bucketed_range_threshold=self.config.bucketed_range_threshold,
        )
        res = Evaluator(ctx).eval(node)
        if isinstance(res, VectorResult):
            return res.df.select("t", "labels", "value")
        if isinstance(res, ScalarResult):
            if res.is_const:
                return Evaluator(ctx).steps_df().select(
                    "t",
                    F.expr("cast(map() as map<string,string>)").alias("labels"),
                    F.lit(float(res.const)).alias("value"),
                )
            return res.df.select(
                "t",
                F.expr("cast(map() as map<string,string>)").alias("labels"),
                "value",
            )
        if isinstance(res, StringResult):
            raise PromQLEvalError("string results are not materializable")
        raise PromQLEvalError("unexpected result type")

    def query_instant(
        self, samples: DataFrame, promql: str, time_ms: int
    ) -> DataFrame:
        return self.query_range(samples, promql, time_ms, time_ms, 1)


def explode_labels(df: DataFrame, keys: list[str], keep_name: bool = False) -> DataFrame:
    """Project label-map entries to plain string columns (for tests/oracles)."""
    cols = [F.col("t"), F.col("value")]
    if keep_name:
        cols.insert(1, F.col("labels").getItem(NAME_LABEL).alias("name"))
    for k in keys:
        cols.append(F.col("labels").getItem(k).alias(k))
    return df.select(*cols)
