"""metric_store_release_spark — a PySpark-native time-series analytics engine.

A from-scratch re-expression of the query and data-processing capabilities of
cloudfoundry/metric-store-release (a clustered Prometheus-API-compatible TSDB)
on Apache Spark: PromQL parsed to an AST and compiled to DataFrame plans that
Catalyst optimizes, Structured Streaming for the ingest/rollup pipeline, and
Parquet date-partitioned storage standing in for 24 h TSM shards.

Reference (semantics only, not code): /root/reference
  - data model:  src/pkg/rpc/rpc.go:3-8
  - query layer: vendor/github.com/prometheus/prometheus/promql/
"""

from metric_store_release_spark.engine.engine import PromQLEngine, EngineConfig
from metric_store_release_spark.engine.admission import (
    QueryLimitError,
    QueryTimeoutError,
)

__all__ = ["PromQLEngine", "EngineConfig", "QueryLimitError", "QueryTimeoutError"]
__version__ = "0.1.0"
