"""Profile one or more declared queries: run with the UI enabled, then dump
the per-SQL-execution wall-clock breakdown from the UI REST API.

Usage: python scripts/profile_query.py [-r RUNS] query [query ...]

Same session confs / timed region as bench.py, but keeps the UI up and
prints, after each query's runs, the SQL executions recorded during the
LAST run sorted by duration — the same evidence the round-11 report's
same-session breakdowns used. For optimization iteration only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "-r":
        runs = int(args[1])
        args = args[2:]
    names = args
    if not names:
        print("usage: profile_query.py [-r RUNS] query [query ...]")
        return

    from metric_store_release_spark.session import get_spark
    from metric_store_release_spark.pipeline.dedup import leased

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="profile_query",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    qs = entry_mod.queries()

    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    setup = {
        "promql_sum_by_user_federated",
        "embedding_ann_probe",
        "embedding_ann_pq",
        "embedding_ann_append",
        "events_sessionize_bucketed",
        "events_range_scan_zordered",
        "events_range_scan_hilbert",
    }
    for s in setup & set(names):
        qs[s](spark, SF_DIR)
    if {"dedup_substring_incr", "corpus_prepare_stream"} & set(names):
        entry_mod._span_index_for(spark, SF_DIR)
    if "dedup_components_incr" in names:
        entry_mod._components_labels_for(spark, SF_DIR)

    for name in names:
        fn = qs[name]
        for r in range(runs):
            # high-water mark of already-recorded executions before the run
            try:
                prev = _api(ui, f"applications/{app_id}/sql?length=10000")
                hw = max((e["id"] for e in prev), default=-1)
            except Exception:
                hw = -1
            spark.sparkContext.setJobDescription(f"{name} run{r + 1}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            with leased(df) as d:
                n = d.count()
            t_total = time.perf_counter() - t0
            print(
                f"# {name} run{r + 1}: total={t_total:.3f}s "
                f"build={t_build:.3f}s rows={n}",
                flush=True,
            )
            if r == runs - 1:
                execs = _api(ui, f"applications/{app_id}/sql?length=10000")
                mine = [e for e in execs if e["id"] > hw]
                mine.sort(key=lambda e: -e.get("duration", 0))
                print(f"## {name}: {len(mine)} SQL executions in last run")
                for e in mine[:25]:
                    desc = (e.get("description") or "").replace("\n", " ")
                    print(
                        f"  {e['duration'] / 1000:8.3f}s  id={e['id']:<5}"
                        f" {desc[:110]}"
                    )
    spark.stop()


if __name__ == "__main__":
    main()
