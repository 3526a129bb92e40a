"""Rules API: per-tenant rule-manager CRUD + v1 rules/alerts envelopes.

Reference surface (src/internal/api/rules_api.go:56-76):

    POST   /rules/manager                       create a rule manager
    POST   /rules/manager/<id>/group            upsert a rule group
    DELETE /rules/manager/<id>                  delete a manager

with rulesclient payload validation (src/pkg/rulesclient/rule_group.go:26-46
— name required, interval >= 1m when set, >= 1 rule; rule.go:22-34 — record
XOR alert, expr must parse, `for` only on alerting rules), plus the
Prometheus v1 read endpoints the reference serves through its vendored web
API (`/api/v1/rules`, `/api/v1/alerts` — web/api/v1/api.go rules/alerts
handlers, with rule health and firing/pending alert state).

Transport is the caller's concern (same stance as api.py): handlers take and
return plain dicts ready for JSON encoding, so any HTTP framework — or a
test — can mount them. Evaluation stays Spark-side via rules.evaluate_group.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from metric_store_release_spark.promql import parse
from metric_store_release_spark.promql.lexer import parse_duration_ms
from metric_store_release_spark.rules import (
    AlertingRule,
    AlertState,
    RecordingRule,
    RuleGroup,
    evaluate_group,
)


class RulesApiError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


class ManagerExistsError(RulesApiError):
    def __init__(self, manager_id: str):
        super().__init__(
            409,
            "Could not create ruleManager, a ruleManager with name "
            f"{manager_id} already exists",
        )


class ManagerNotExistsError(RulesApiError):
    def __init__(self, manager_id: str, verb: str = "delete"):
        super().__init__(
            404,
            f"Could not {verb} ruleManager, a ruleManager with name "
            f"{manager_id} does not exist",
        )


_METRIC_NAME_RE = re.compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")
_LABEL_NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def _validate_rule(raw: dict) -> RecordingRule | AlertingRule:
    """rulesclient/rule.go:22-34 + vendored rulefmt.Rule.Validate."""
    record = raw.get("record", "")
    alert = raw.get("alert", "")
    expr = raw.get("expr", "")
    if record and alert:
        raise RulesApiError(400, "only one of 'record' and 'alert' must be set")
    if not record and not alert:
        raise RulesApiError(400, "one of 'record' or 'alert' must be set")
    if not expr:
        raise RulesApiError(400, "field 'expr' must be set in rule")
    try:
        parse(expr)
    except Exception as e:
        raise RulesApiError(400, f"could not parse expression: {e}") from e
    for name in raw.get("labels", {}) or {}:
        if not _LABEL_NAME_RE.match(name):
            raise RulesApiError(400, f"invalid label name: {name!r}")
    if record:
        if raw.get("for"):
            raise RulesApiError(400, "invalid field 'for' in recording rule")
        if raw.get("annotations"):
            raise RulesApiError(
                400, "invalid field 'annotations' in recording rule"
            )
        if not _METRIC_NAME_RE.match(record):
            raise RulesApiError(400, f"invalid recording rule name: {record!r}")
        return RecordingRule(
            record=record, expr=expr, labels=dict(raw.get("labels") or {})
        )
    for_ms = 0
    if raw.get("for"):
        try:
            for_ms = parse_duration_ms(str(raw["for"]).strip('"'))
        except Exception as e:
            raise RulesApiError(400, f"invalid 'for' duration: {e}") from e
    return AlertingRule(
        alert=alert, expr=expr, for_ms=for_ms,
        labels=dict(raw.get("labels") or {}),
    )


def _validate_group(raw: dict) -> RuleGroup:
    """rulesclient/rule_group.go:26-46."""
    name = raw.get("name", "")
    if not name:
        raise RulesApiError(400, "name is required")
    interval_ms = 60_000
    if raw.get("interval"):
        try:
            interval_ms = parse_duration_ms(str(raw["interval"]))
        except Exception as e:
            raise RulesApiError(400, f"invalid interval: {e}") from e
        if interval_ms < 60_000:
            raise RulesApiError(400, "interval is too short")
    rules_raw = raw.get("rules", []) or []
    if not rules_raw:
        raise RulesApiError(400, "at least one rule is required")
    return RuleGroup(
        name=name,
        interval_ms=interval_ms,
        rules=[_validate_rule(r) for r in rules_raw],
    )


@dataclass
class _Manager:
    manager_id: str
    alertmanagers: list[str] = field(default_factory=list)
    groups: dict[str, RuleGroup] = field(default_factory=dict)
    alert_states: dict[str, AlertState] = field(default_factory=dict)
    #: (group, alert) -> firing/pending label tuples from the last tick
    last_alerts: dict[str, dict[str, tuple[list, list]]] = field(
        default_factory=dict
    )


class RuleManagerRegistry:
    """rules.RuleManager analog: named managers, each owning rule groups.

    The reference persists one vendored rules.Manager per tenant and
    evaluates every group on its interval; here `evaluate_all` is the tick
    (caller's scheduler), running each group's Spark evaluation and
    appending recordings to the store."""

    def __init__(self) -> None:
        self._managers: dict[str, _Manager] = {}

    # --- CRUD (rules_api.go:78-186) -----------------------------------
    def create_manager(
        self, manager_id: str | None = None, alertmanagers: list[str] | None = None
    ) -> dict[str, Any]:
        mid = manager_id or uuid.uuid4().hex
        if mid in self._managers:
            raise ManagerExistsError(mid)
        self._managers[mid] = _Manager(mid, list(alertmanagers or []))
        return {"id": mid, "alertmanagers": list(alertmanagers or [])}

    def delete_manager(self, manager_id: str) -> None:
        if manager_id not in self._managers:
            raise ManagerNotExistsError(manager_id)
        del self._managers[manager_id]

    def upsert_rule_group(self, manager_id: str, group_raw: dict) -> dict:
        if manager_id not in self._managers:
            raise ManagerNotExistsError(manager_id, verb="update")
        group = _validate_group(group_raw)
        self._managers[manager_id].groups[group.name] = group
        return group_raw

    # --- evaluation tick ----------------------------------------------
    def evaluate_all(
        self,
        spark: SparkSession,
        samples: DataFrame,
        ts_ms: int,
        store_path: str | None = None,
    ) -> None:
        for m in self._managers.values():
            for group in m.groups.values():
                _, alerts = evaluate_group(
                    spark, samples, group, ts_ms,
                    store_path=store_path, alert_states=m.alert_states,
                )
                m.last_alerts[group.name] = alerts

    # --- v1 read envelopes (web/api/v1/api.go rules/alerts) -----------
    def rules_response(self) -> dict[str, Any]:
        groups = []
        for m in sorted(self._managers.values(), key=lambda x: x.manager_id):
            for group in m.groups.values():
                rules_out: list[dict] = []
                for r in group.rules:
                    if isinstance(r, RecordingRule):
                        rules_out.append(
                            {
                                "type": "recording",
                                "name": r.record,
                                "query": r.expr,
                                "labels": r.labels,
                                "health": "ok",
                            }
                        )
                    else:
                        firing, pending = m.last_alerts.get(group.name, {}).get(
                            r.alert, ([], [])
                        )
                        state = (
                            "firing"
                            if firing
                            else ("pending" if pending else "inactive")
                        )
                        rules_out.append(
                            {
                                "type": "alerting",
                                "name": r.alert,
                                "query": r.expr,
                                "duration": r.for_ms / 1000.0,
                                "labels": r.labels,
                                "state": state,
                                "alerts": self._alerts_for(m, group.name, r),
                                "health": "ok",
                            }
                        )
                groups.append(
                    {
                        "name": group.name,
                        "interval": group.interval_ms / 1000.0,
                        "rules": rules_out,
                    }
                )
        return {"status": "success", "data": {"groups": groups}}

    def _alerts_for(
        self, m: _Manager, group_name: str, rule: AlertingRule
    ) -> list[dict]:
        firing, pending = m.last_alerts.get(group_name, {}).get(
            rule.alert, ([], [])
        )
        out = []
        for keys, state in ((firing, "firing"), (pending, "pending")):
            for key in keys:
                out.append(
                    {
                        "labels": {
                            **dict(key),
                            **rule.labels,
                            "alertname": rule.alert,
                        },
                        "state": state,
                    }
                )
        return out

    def alerts_response(self) -> dict[str, Any]:
        alerts: list[dict] = []
        for m in self._managers.values():
            for group in m.groups.values():
                for r in group.rules:
                    if isinstance(r, AlertingRule):
                        alerts.extend(self._alerts_for(m, group.name, r))
        return {"status": "success", "data": {"alerts": alerts}}
