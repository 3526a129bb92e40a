"""Rules API CRUD + validation + v1 rules/alerts envelopes
(rules_api.go:56-186, rulesclient/rule_group.go:26-46)."""

from __future__ import annotations

import pytest

from metric_store_release_spark.rules_api import (
    ManagerExistsError,
    ManagerNotExistsError,
    RuleManagerRegistry,
    RulesApiError,
)
from metric_store_release_spark.sources import corpus

MIN = 60_000


def test_manager_crud_lifecycle():
    reg = RuleManagerRegistry()
    created = reg.create_manager("tenant-a", ["http://alertmanager:9093"])
    assert created == {
        "id": "tenant-a", "alertmanagers": ["http://alertmanager:9093"]
    }
    # auto-generated id when none given
    anon = reg.create_manager()
    assert len(anon["id"]) == 32
    with pytest.raises(ManagerExistsError) as e:
        reg.create_manager("tenant-a")
    assert e.value.status == 409
    reg.delete_manager("tenant-a")
    with pytest.raises(ManagerNotExistsError) as e:
        reg.delete_manager("tenant-a")
    assert e.value.status == 404


def test_group_validation():
    reg = RuleManagerRegistry()
    reg.create_manager("m")
    ok = {
        "name": "g",
        "interval": "2m",
        "rules": [{"record": "job:up:sum", "expr": "sum(up)"}],
    }
    assert reg.upsert_rule_group("m", ok) == ok
    with pytest.raises(ManagerNotExistsError):
        reg.upsert_rule_group("ghost", ok)
    for bad, msg in [
        ({"rules": [{"record": "r", "expr": "up"}]}, "name is required"),
        ({"name": "g", "rules": []}, "at least one rule"),
        ({"name": "g", "interval": "30s",
          "rules": [{"record": "r", "expr": "up"}]}, "interval is too short"),
        ({"name": "g", "rules": [{"expr": "up"}]}, "one of 'record' or 'alert'"),
        ({"name": "g", "rules": [{"record": "r", "alert": "a", "expr": "up"}]},
         "only one of"),
        ({"name": "g", "rules": [{"record": "r"}]}, "'expr' must be set"),
        ({"name": "g", "rules": [{"record": "r", "expr": "sum(("}]},
         "could not parse"),
        ({"name": "g", "rules": [{"record": "bad name", "expr": "up"}]},
         "invalid recording rule name"),
        ({"name": "g", "rules": [{"record": "r", "expr": "up", "for": "5m"}]},
         "invalid field 'for'"),
        ({"name": "g",
          "rules": [{"alert": "a", "expr": "up", "for": "bogus"}]},
         "invalid 'for'"),
    ]:
        with pytest.raises(RulesApiError, match=msg):
            reg.upsert_rule_group("m", bad)


def test_evaluate_and_envelopes(spark):
    samples = corpus.load(
        spark, MIN,
        ['errors{job="a"} 0+100x10', 'errors{job="b"} 0+1x10'],
    )
    reg = RuleManagerRegistry()
    reg.create_manager("m")
    reg.upsert_rule_group(
        "m",
        {
            "name": "g",
            "rules": [
                {"record": "job:errors:rate5m",
                 "expr": "rate(errors[5m])"},
                {"alert": "HighErrorRate",
                 "expr": "rate(errors[5m]) > 1",
                 "for": "1m",
                 "labels": {"severity": "page"}},
            ],
        },
    )
    # two ticks 2m apart: pending → firing for job=a only
    reg.evaluate_all(spark, samples, 5 * MIN)
    pend = reg.rules_response()["data"]["groups"][0]["rules"][1]
    assert pend["state"] == "pending"
    reg.evaluate_all(spark, samples, 7 * MIN)
    env = reg.rules_response()
    g = env["data"]["groups"][0]
    assert g["name"] == "g" and g["interval"] == 60.0
    rec, alert = g["rules"]
    assert rec == {
        "type": "recording", "name": "job:errors:rate5m",
        "query": "rate(errors[5m])", "labels": {}, "health": "ok",
    }
    assert alert["state"] == "firing" and alert["duration"] == 60.0
    active = reg.alerts_response()["data"]["alerts"]
    assert len(active) == 1
    assert active[0]["labels"]["alertname"] == "HighErrorRate"
    assert active[0]["labels"]["severity"] == "page"
    assert active[0]["labels"]["job"] == "a"
    assert active[0]["state"] == "firing"
