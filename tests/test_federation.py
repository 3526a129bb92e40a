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
    """A replica that missed writes (handoff window) must not shrink or
    duplicate the read result."""
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
    got = fed.select_samples("http")
    assert got.count() == df.count()  # no duplicates, nothing lost


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
