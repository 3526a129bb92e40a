"""streaming/hll_stream.py: cross-batch distinct counting via a
persistent HLL register store.

Stream/batch equivalence (register max-merge is lossless, so the store
estimate equals hll_distinct over everything ever ingested), restart
from the store alone, and statelessness of the query itself (no
stateful operator in the progress telemetry).
"""

from __future__ import annotations

from metric_store_release_spark.pipeline.sketches import hll_distinct
from metric_store_release_spark.streaming.hll_stream import (
    run_hll_ingest,
    store_estimate,
)


def _keys(lo: int, hi: int) -> list[tuple[int]]:
    return [(k,) for k in range(lo, hi)]


def test_streaming_hll_equals_batch_and_is_stateless(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    # three overlapping batches: 0..400, 300..700, 600..1000 -> 1000 distinct
    spark.createDataFrame(_keys(0, 400), "user_id long").write.parquet(src)
    spark.createDataFrame(_keys(300, 700), "user_id long").write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(_keys(600, 1000), "user_id long").write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = run_hll_ingest(stream, store, str(tmp_path / "ckpt"), p=9)
    q.processAllAvailable()
    progress = q.lastProgress
    q.stop()

    # the query itself is stateless — state lives in the store
    assert progress is None or progress["stateOperators"] in ([], None)

    got = store_estimate(spark, store, p=9)
    want = hll_distinct(
        spark.read.parquet(src), "user_id", (), p=9
    ).collect()[0]["hll_est"]
    assert got == want  # lossless merge: stream == batch exactly
    assert abs(got - 1000) / 1000 < 0.15  # and the estimate is sane


def test_streaming_hll_restart_resumes_from_store(spark, tmp_path):
    """A brand-new query (fresh checkpoint, new source) keeps counting
    on top of the register store an earlier run built."""
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    store = str(tmp_path / "store")
    spark.createDataFrame(_keys(0, 500), "user_id long").write.parquet(s1)
    q1 = run_hll_ingest(
        spark.readStream.schema("user_id long").parquet(s1),
        store,
        str(tmp_path / "c1"),
        p=9,
    )
    q1.processAllAvailable()
    q1.stop()

    spark.createDataFrame(_keys(250, 750), "user_id long").write.parquet(s2)
    q2 = run_hll_ingest(
        spark.readStream.schema("user_id long").parquet(s2),
        store,
        str(tmp_path / "c2"),
        p=9,
    )
    q2.processAllAvailable()
    q2.stop()

    got = store_estimate(spark, store, p=9)
    both = spark.read.parquet(s1).unionByName(spark.read.parquet(s2))
    want = hll_distinct(both, "user_id", (), p=9).collect()[0]["hll_est"]
    assert got == want
