"""Scrape target manager — scheduled HTTP fetch of /metrics targets.

Reference: src/internal/scraping/scraper.go:35-113 delegates to the vendored
Prometheus scrape.Manager: each configured job polls its targets every
scrape_interval, decorates samples with job/instance labels, records a
synthetic `up` series per attempt, and appends to storage. Spark analog:

  - the target list is a DataFrame (thousands of targets at fleet scale);
  - each tick distributes the HTTP fetches across executors with
    mapInPandas (stdlib urllib, bounded timeout, one connection per row —
    no external HTTP deps);
  - the payloads parse via the pure-SQL exposition parser
    (sources/exposition.py) — no Python in the parse path;
  - `run()` is the scheduling loop (scrape.Manager.Run): fire every
    interval, hand each batch to the appender (write_samples or a
    recording-rule input).

honor_labels=false semantics: scraped `job`/`instance` labels are replaced
by the target's own, like the reference's default scrape config.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metric_store_release_spark.sources.exposition import parse_exposition

SCRAPE_SCHEMA = (
    "job string, target string, scrape_ts long, body string, "
    "up double, scrape_duration_seconds double"
)


@dataclass
class ScrapeConfig:
    """One scrape job (prom_config.ScrapeConfig analog): a named set of
    targets polled on a shared interval."""

    job_name: str
    targets: list[str] = field(default_factory=list)  # host:port
    scrape_interval_ms: int = 15_000
    metrics_path: str = "/metrics"
    scheme: str = "http"
    scrape_timeout_ms: int = 10_000


def targets_df(spark: SparkSession, configs: list[ScrapeConfig]) -> DataFrame:
    rows = [
        (c.job_name, t, f"{c.scheme}://{t}{c.metrics_path}", c.scrape_timeout_ms)
        for c in configs
        for t in c.targets
    ]
    return spark.createDataFrame(
        rows, "job string, target string, url string, timeout_ms int"
    )


def fetch_targets(targets: DataFrame) -> DataFrame:
    """Distributed HTTP GET of every target (one tick).

    Executor-side urllib with per-target timeout; a failed fetch yields an
    empty body and up=0 (the scrape.Manager's report() analog). Repartition
    to the target count caps per-task serial fetches at ~1 for small fleets
    while large fleets amortize connections per task.
    """

    def fetch(batches: Iterator) -> Iterator:
        import pandas as pd
        import urllib.request

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                t0 = time.time()
                ts = int(t0 * 1000)
                try:
                    with urllib.request.urlopen(
                        r.url, timeout=r.timeout_ms / 1000.0
                    ) as resp:
                        body = resp.read().decode("utf-8", errors="replace")
                    up = 1.0
                except Exception:
                    body, up = "", 0.0
                out.append(
                    (r.job, r.target, ts, body, up, time.time() - t0)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "job", "target", "scrape_ts", "body", "up",
                    "scrape_duration_seconds",
                ],
            )

    n = targets.count()
    return targets.repartition(max(int(n), 1)).mapInPandas(
        fetch, schema=SCRAPE_SCHEMA
    )


def scrape_once(
    spark: SparkSession, configs: list[ScrapeConfig]
) -> DataFrame:
    """One scrape tick → samples (ts, name, value, labels).

    Parses every fetched body and appends the synthetic per-target series
    the reference's scrape loop reports: `up` and
    `scrape_duration_seconds` (scrape/scrape.go report()). The returned
    plan holds a cached scrape batch; long-running callers should use
    `_scrape_tick` and unpersist after consuming (ScrapeManager does).
    """
    samples, _scrapes = _scrape_tick(spark, configs)
    return samples


def _scrape_tick(
    spark: SparkSession, configs: list[ScrapeConfig]
) -> tuple[DataFrame, DataFrame]:
    """One tick → (samples, cached scrapes handle for unpersist)."""
    scrapes = fetch_targets(targets_df(spark, configs))
    # one tick is small; cache so the parse and the synthetic series don't
    # re-fetch the targets
    scrapes = scrapes.cache()
    parsed = parse_exposition(scrapes)
    with_job = parsed.join(
        F.broadcast(scrapes.select("target", "job").distinct()),
        parsed["labels"]["instance"] == F.col("target"),
        "left",
    ).select(
        "ts",
        "name",
        "value",
        F.map_concat(
            F.map_filter(F.col("labels"), lambda k, _: k != F.lit("job")),
            F.create_map(F.lit("job"), F.coalesce(F.col("job"), F.lit(""))),
        ).alias("labels"),
    )
    synth_labels = F.create_map(
        F.lit("instance"), F.col("target"), F.lit("job"), F.col("job")
    )
    synthetic = scrapes.selectExpr(
        "scrape_ts as ts", "stack(2, 'up', up, "
        "'scrape_duration_seconds', scrape_duration_seconds) as (name, value)",
        "target", "job",
    ).select("ts", "name", "value", synth_labels.alias("labels"))
    return with_job.unionByName(synthetic), scrapes


class ScrapeManager:
    """scrape.Manager analog: a scheduling loop over the configured jobs.

    Each tick runs `scrape_once` and hands the samples DataFrame to the
    appender. The loop is driver-side scheduling only — all fetch/parse
    work runs on executors."""

    def __init__(
        self,
        spark: SparkSession,
        configs: list[ScrapeConfig],
        appender: Callable[[DataFrame], None],
    ):
        self.spark = spark
        self.configs = configs
        self.appender = appender
        self.ticks = 0

    def run(self, iterations: int | None = None) -> None:
        """Scrape each job on ITS OWN interval until `iterations` ticks done
        (None = forever, the reference's Run). A tick scrapes only the
        due jobs — scrape.Manager runs one loop per scrapePool, so a 15 s
        job never drags a 60 s job onto its cadence. Each tick's cached
        scrape batch is unpersisted once the appender has consumed it, so
        a long-running loop holds at most one tick of executor storage."""
        now = time.time()
        next_due = {c.job_name: now for c in self.configs}
        while iterations is None or self.ticks < iterations:
            now = time.time()
            due = [c for c in self.configs if next_due[c.job_name] <= now]
            if due:
                samples, scrapes = _scrape_tick(self.spark, due)
                try:
                    self.appender(samples)
                finally:
                    scrapes.unpersist()
                for c in due:
                    next_due[c.job_name] = now + c.scrape_interval_ms / 1000.0
                self.ticks += 1
                if iterations is not None and self.ticks >= iterations:
                    break
            time.sleep(max(0.0, min(next_due.values()) - time.time()))
