"""Federated routing + replicated read (replicated_querier.go analog)."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from metric_store_release_spark.sources.federation import (
    FederatedStore,
    RoutingTable,
    _jump_hash,
)


def _samples(spark, names=("http", "grpc", "disk"), n=30):
    rows = [
        (1_000 * i, name, float(i + j), {"job": f"j{j}"})
        for name in names
        for i in range(n)
        for j in range(2)
    ]
    return spark.createDataFrame(
        rows, "ts long, name string, value double, labels map<string,string>"
    )


def test_jump_hash_properties():
    # deterministic, in-range, and stable under bucket growth for most keys
    # (the consistent-hash contract)
    for n in (1, 3, 8):
        for k in range(200):
            b = _jump_hash(k * 2654435761, n)
            assert 0 <= b < n
    moved = sum(
        _jump_hash(k * 2654435761, 8) != _jump_hash(k * 2654435761, 9)
        for k in range(1000)
    )
    assert moved < 1000 * 2 / 9  # ~1/9 expected to move 8→9 buckets


def test_routing_table_replicas():
    t = RoutingTable(5, replication_factor=3)
    reps = t.lookup("http_requests")
    assert len(set(reps)) == 3 and all(0 <= r < 5 for r in reps)
    assert reps == t.lookup("http_requests")  # deterministic
    assert all(t.is_local("http_requests", r) for r in reps)
    with pytest.raises(ValueError):
        RoutingTable(2, replication_factor=3)


def test_replicated_write_and_read(spark, tmp_path):
    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=3,
                         replication_factor=2)
    df = _samples(spark)
    fed.write(df)
    # every metric readable, equal to its slice of the input
    for name in ("http", "grpc", "disk"):
        got = fed.select_samples(name)
        want = df.filter(F.col("name") == name)
        assert got.count() == want.count()
        assert got.join(
            want, ["ts", "name", "value"], "left_anti"
        ).count() == 0
    # each metric's rows exist on exactly replication_factor node dirs
    whole = spark.read.parquet(str(tmp_path / "fed"))
    per_node = (
        whole.groupBy("name", "node").count().groupBy("name").count().collect()
    )
    assert all(r["count"] == 2 for r in per_node)


def test_failover_skips_dead_replica(spark, tmp_path):
    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=3,
                         replication_factor=2)
    df = _samples(spark, names=("http",))
    fed.write(df)
    nodes = fed.table.lookup("http")
    shutil.rmtree(fed.node_path(nodes[0]))  # kill the primary
    got = fed.select_samples("http")  # served by the surviving replica
    assert got.count() == df.count()
    shutil.rmtree(fed.node_path(nodes[1]))
    with pytest.raises(FileNotFoundError):
        fed.select_samples("http")


def test_divergence_healed_at_read(spark, tmp_path):
    """heal=True: a replica that missed writes (handoff window) must not
    shrink or duplicate the read result, whichever replica is primary."""
    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=2,
                         replication_factor=2)
    df = _samples(spark, names=("http",), n=20)
    early = df.filter(F.col("ts") < 10_000)
    # node 0 saw everything; node 1 was down for the late half
    n0, n1 = fed.node_path(0), fed.node_path(1)
    for path, part in ((n0, df), (n1, early)):
        part.withColumn(
            "date", F.to_date(F.timestamp_millis(F.col("ts")))
        ).write.partitionBy("date").parquet(path)
    got = fed.select_samples("http", heal=True)
    assert got.count() == df.count()  # no duplicates, nothing lost
    # default read = reference semantics: one replica serves, no heal agg —
    # the result is exactly SOME single replica's content
    assert fed.select_samples("http").count() in (df.count(), early.count())


def test_rf2_heal_still_dedups_and_rf1_skips(spark, tmp_path):
    """RF>=2 with heal scans both replicas and collapses the copies; the
    default read and every RF=1 read must carry NO dedup aggregation in the
    plan (the skip that removes the round-4 federated premium)."""
    df = _samples(spark, names=("http",), n=10)

    fed2 = FederatedStore(spark, str(tmp_path / "fed2"), n_nodes=2,
                          replication_factor=2)
    fed2.write(df)
    healed = fed2.select_samples("http", heal=True)
    # both replicas hold every row; without the dedup agg this would be 2x
    assert healed.count() == df.count()
    assert "Aggregate" in healed._jdf.queryExecution().optimizedPlan().toString()

    plain = fed2.select_samples("http")
    assert plain.count() == df.count()
    assert "Aggregate" not in plain._jdf.queryExecution().optimizedPlan().toString()

    fed1 = FederatedStore(spark, str(tmp_path / "fed1"), n_nodes=3,
                          replication_factor=1)
    fed1.write(df)
    got = fed1.select_samples("http", heal=True)  # RF=1: heal is a no-op
    assert got.count() == df.count()
    assert "Aggregate" not in got._jdf.queryExecution().optimizedPlan().toString()


def test_handoff_queue_and_replay(spark, tmp_path):
    """Writes for a down node queue to the handoff log and replay on
    recovery (write_replayer.go:17-41 analog)."""
    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=2,
                         replication_factor=2)
    df = _samples(spark, names=("http",), n=10)
    fed.write(df, down_nodes={1}, queued_at_ms=5_000)
    # node 1 holds nothing yet; node 0 serves reads
    assert fed.select_samples("http").count() == df.count()
    assert spark.read.parquet(fed.node_path(0)).count() == df.count()
    assert fed.handoff.pending_batches(1) == [5_000]
    assert fed.handoff.disk_usage(1) > 0
    # recovery: replay drains the queue into node 1's store
    replayed = fed.replay_handoff(1, now_ms=10_000)
    assert replayed == df.count()
    assert spark.read.parquet(fed.node_path(1)).count() == df.count()
    assert fed.handoff.pending_batches(1) == []
    # reads still deduped after both replicas are whole again
    assert fed.select_samples("http").count() == df.count()


def test_handoff_max_age_purge(spark, tmp_path):
    """Batches older than MaxAge are purged, not replayed
    (write_replayer.go DefaultMaxAge)."""
    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=2,
                         replication_factor=2)
    old = _samples(spark, names=("http",), n=5)
    new = _samples(spark, names=("grpc",), n=5)
    fed.write(old, down_nodes={0, 1}, queued_at_ms=1_000)
    fed.write(new, down_nodes={0, 1}, queued_at_ms=900_000)
    for node in (0, 1):
        replayed = fed.replay_handoff(node, now_ms=1_000_000,
                                      max_age_ms=500_000)
        # only the fresh batch's rows routed to this node come back
        assert replayed <= new.count()
    whole = fed.read_all()
    assert whole.filter(F.col("name") == "http").count() == 0  # purged
    assert whole.filter(F.col("name") == "grpc").count() == new.count()


def test_samples_for_query_routes_all_selectors(spark, tmp_path):
    """Query-level routing (replicated_querier.go Select): every selector's
    metric resolves through its replica set; non-equality name matchers are
    rejected like the reference's extractMetricName."""
    from metric_store_release_spark.engine.engine import PromQLEngine

    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=3,
                         replication_factor=2)
    df = _samples(spark)
    fed.write(df)
    eng = PromQLEngine(spark)
    q = "sum(http) + sum(grpc)"
    direct = eng.query_range(df, q, 0, 29_000, 5_000)
    routed = eng.query_range(fed.samples_for_query(q), q, 0, 29_000, 5_000)
    assert sorted(map(tuple, direct.select("t", "value").collect())) == sorted(
        map(tuple, routed.select("t", "value").collect())
    )
    with pytest.raises(ValueError, match="strict equality"):
        fed.samples_for_query('{__name__=~"http|grpc"}')
    with pytest.raises(ValueError, match="no metric name"):
        fed.samples_for_query('{job="j0"}')


def test_api_over_federated_store(spark, tmp_path):
    """The Prometheus v1 API surface serves from a federated read exactly as
    from a single store (prom_api.go routes /api/v1/* through the replicated
    querier)."""
    from metric_store_release_spark import api

    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=3,
                         replication_factor=2)
    df = _samples(spark)
    fed.write(df)
    whole = fed.read_all()
    assert set(api.label_values(whole, "__name__")["data"]) == {
        "http", "grpc", "disk"
    }
    assert "job" in api.labels(whole)["data"]
    got = api.series(whole, matches=["http"])
    assert {s.get("job") for s in got["data"]} == {"j0", "j1"}


def test_promql_over_federated_store(spark, tmp_path):
    """End-to-end: the PromQL engine queries a federated read exactly as it
    queries a single-store samples frame."""
    from metric_store_release_spark.engine.engine import PromQLEngine

    fed = FederatedStore(spark, str(tmp_path / "fed"), n_nodes=3,
                         replication_factor=2)
    df = _samples(spark)
    fed.write(df)
    eng = PromQLEngine(spark)
    direct = eng.query_range(df, "sum(http)", 0, 29_000, 5_000)
    federated = eng.query_range(
        fed.select_samples("http"), "sum(http)", 0, 29_000, 5_000
    )
    assert sorted(map(tuple, direct.select("t", "value").collect())) == sorted(
        map(tuple, federated.select("t", "value").collect())
    )
