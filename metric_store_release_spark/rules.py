"""Recording & alerting rules: scheduled PromQL pipelines writing back.

Reference: one vendored rules.Manager per tenant evaluates rule groups every
minute; recording results append to storage through the replicated appender,
alert rules track `for`-state and notify (src/internal/rules/
prom_manager.go:35-97, vendor rules/manager.go:643+, rules/alerting.go:326+).

Spark-native: a rule evaluation is a batch query over the samples store at
`now`; recordings append as new named series (PromQL's only extensibility
mechanism — there are no UDFs, SURVEY.md §2.10). Scheduling is the caller's
loop/cron; evaluate_group is idempotent per (group, ts).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_store_release_spark.engine.engine import EngineConfig, PromQLEngine


@dataclass
class RecordingRule:
    record: str  # new metric name (rulesclient/rule_group.go:18-23)
    expr: str
    labels: dict[str, str] = field(default_factory=dict)


@dataclass
class AlertingRule:
    alert: str
    expr: str
    for_ms: int = 0
    labels: dict[str, str] = field(default_factory=dict)


@dataclass
class RuleGroup:
    name: str
    interval_ms: int = 60_000  # metric_store.go:43
    rules: list[RecordingRule | AlertingRule] = field(default_factory=list)


def evaluate_recording(
    engine: PromQLEngine, samples: DataFrame, rule: RecordingRule, ts_ms: int
) -> DataFrame:
    """One recording evaluation → new points (ts, name, value, labels)."""
    out = engine.query_instant(samples, rule.expr, ts_ms)
    labels = F.map_filter(
        F.col("labels"), lambda k, _: k != F.lit("__name__")
    )
    for k, v in rule.labels.items():
        labels = F.map_concat(
            F.map_filter(labels, lambda kk, _: kk != F.lit(k)),
            F.create_map(F.lit(k), F.lit(v)),
        )
    return out.select(
        F.col("t").alias("ts"),
        F.lit(rule.record).alias("name"),
        F.col("value"),
        labels.alias("labels"),
    )


@dataclass
class AlertState:
    """`for`-state tracking (vendor rules/alerting.go pending→firing)."""

    pending_since: dict[tuple, int] = field(default_factory=dict)

    def transition(self, rule: AlertingRule, active_keys: set[tuple], ts_ms: int):
        firing, pending = [], []
        for key in active_keys:
            since = self.pending_since.setdefault(key, ts_ms)
            if ts_ms - since >= rule.for_ms:
                firing.append(key)
            else:
                pending.append(key)
        for key in list(self.pending_since):
            if key not in active_keys:
                del self.pending_since[key]
        return firing, pending


def evaluate_alert(
    engine: PromQLEngine,
    samples: DataFrame,
    rule: AlertingRule,
    ts_ms: int,
    state: AlertState,
):
    """One alert evaluation → (firing, pending) label-tuple lists."""
    out = engine.query_instant(samples, rule.expr, ts_ms)
    active = {
        tuple(sorted((r["labels"] or {}).items())) for r in out.collect()
    }
    return state.transition(rule, active, ts_ms)


def evaluate_group(
    spark: SparkSession,
    samples: DataFrame,
    group: RuleGroup,
    ts_ms: int,
    store_path: str | None = None,
    engine: PromQLEngine | None = None,
    alert_states: dict[str, AlertState] | None = None,
):
    """Evaluate all rules of a group at ts; append recordings to the store
    (prom_manager.go:48-56 writeback). Returns (recorded_df, alerts)."""
    eng = engine or PromQLEngine(spark, EngineConfig())
    recorded = None
    alerts: dict[str, tuple[list, list]] = {}
    if alert_states is None:
        alert_states = {}
    for rule in group.rules:
        if isinstance(rule, RecordingRule):
            pts = evaluate_recording(eng, samples, rule, ts_ms)
            recorded = pts if recorded is None else recorded.unionByName(pts)
        else:
            # NOTE: must mutate the CALLER's dict — `for`-state only works
            # if pending_since survives across evaluation ticks
            st = alert_states.setdefault(rule.alert, AlertState())
            alerts[rule.alert] = evaluate_alert(eng, samples, rule, ts_ms, st)
    if recorded is not None and store_path is not None:
        from metric_store_release_spark.sources.storage import write_samples

        write_samples(recorded, store_path)
    return recorded, alerts
