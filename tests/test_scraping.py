"""Scrape target manager: scheduled HTTP fetch → exposition parse → samples
(scraper.go:35-113 / vendored scrape.Manager analog)."""

from __future__ import annotations

import http.server
import threading

import pytest

from pyspark.sql import functions as F

from metric_store_release_spark.sources.scraping import (
    ScrapeConfig,
    ScrapeManager,
    scrape_once,
)

EXPOSITION = """\
# HELP http_requests_total Total requests.
# TYPE http_requests_total counter
http_requests_total{method="get",job="ignored"} 1027
http_requests_total{method="post"} 3
# gauge with explicit timestamp
queue_depth 7.5 1700000000123
"""


@pytest.fixture(scope="module")
def metrics_server():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = EXPOSITION.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_scrape_once_parses_and_decorates(spark, metrics_server):
    cfg = ScrapeConfig(job_name="web", targets=[metrics_server])
    out = scrape_once(spark, [cfg]).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["name"], []).append(r)
    # parsed series carry instance + job (honor_labels=false: scraped
    # job label is replaced by the config's)
    reqs = by_name["http_requests_total"]
    assert len(reqs) == 2
    for r in reqs:
        assert r["labels"]["instance"] == metrics_server
        assert r["labels"]["job"] == "web"
    # explicit per-line timestamp honored
    q = by_name["queue_depth"][0]
    assert q["ts"] == 1700000000123
    # synthetic up/scrape_duration for the target
    assert by_name["up"][0]["value"] == 1.0
    assert by_name["scrape_duration_seconds"][0]["value"] >= 0.0


def test_scrape_down_target_reports_up_zero(spark):
    cfg = ScrapeConfig(
        job_name="dead",
        targets=["127.0.0.1:1"],  # nothing listens here
        scrape_timeout_ms=500,
    )
    out = scrape_once(spark, [cfg])
    ups = {r["name"]: r["value"] for r in out.collect()}
    assert ups["up"] == 0.0


def test_scrape_manager_appends_each_tick(spark, metrics_server):
    batches = []
    mgr = ScrapeManager(
        spark,
        [ScrapeConfig(job_name="web", targets=[metrics_server],
                      scrape_interval_ms=10)],
        appender=lambda df: batches.append(df.count()),
    )
    mgr.run(iterations=2)
    assert mgr.ticks == 2
    assert len(batches) == 2 and all(n > 0 for n in batches)


def test_scrape_manager_honors_per_job_intervals(spark, metrics_server):
    """A fast job must not drag a slow job onto its cadence: the slow job
    is scraped once (the first tick), the fast one every tick."""
    per_batch_jobs = []
    mgr = ScrapeManager(
        spark,
        [
            ScrapeConfig(job_name="fast", targets=[metrics_server],
                         scrape_interval_ms=10),
            ScrapeConfig(job_name="slow", targets=[metrics_server],
                         scrape_interval_ms=3_600_000),
        ],
        appender=lambda df: per_batch_jobs.append(
            sorted(
                r["labels"]["job"]
                for r in df.filter(F.col("name") == "up").collect()
            )
        ),
    )
    mgr.run(iterations=3)
    assert per_batch_jobs[0] == ["fast", "slow"]
    assert per_batch_jobs[1] == ["fast"] and per_batch_jobs[2] == ["fast"]


def test_scrape_manager_unpersists_tick_cache(spark, metrics_server):
    """Long-running loops must not leak a cached scrape batch per tick."""
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    mgr = ScrapeManager(
        spark,
        [ScrapeConfig(job_name="web", targets=[metrics_server],
                      scrape_interval_ms=10)],
        appender=lambda df: df.count(),
    )
    mgr.run(iterations=3)
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) <= before


def test_scraped_samples_queryable(spark, engine, metrics_server):
    cfg = ScrapeConfig(job_name="web", targets=[metrics_server])
    samples = scrape_once(spark, [cfg]).filter(F.col("name") != "queue_depth")
    t = samples.agg(F.max("ts")).first()[0]
    res = engine.query_instant(
        samples, 'sum by (method) (http_requests_total{job="web"})', t
    ).collect()
    got = {r["labels"]["method"]: r["value"] for r in res}
    assert got == {"get": 1027.0, "post": 3.0}
