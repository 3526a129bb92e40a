"""Time a subset of declared queries with bench.py's exact methodology.

Usage: python scripts/bench_some.py [-r RUNS] query [query ...]

Same timed region as bench.py (build + leased count), same warm-median
statistic, same session confs; prints per-query runs + median. For
optimization-iteration use only — the committed evidence stays bench.py's.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    runs = 4
    if args and args[0] == "-r":
        runs = int(args[1])
        args = args[2:]
    names = args
    if not names:
        print("usage: bench_some.py [-r RUNS] query [query ...]")
        return

    from metric_store_release_spark.session import get_spark
    from metric_store_release_spark.pipeline.dedup import leased

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="bench_some",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # same untimed setup bench.py performs (indexes/bucketed tables)
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
        ts = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{r + 1}")
            t0 = time.perf_counter()
            with leased(fn(spark, SF_DIR)) as df:
                n = df.count()
                took = round(time.perf_counter() - t0, 3)
            ts.append(took)
            print(f"# run{r + 1} {name}: {took}s ({n} rows)", flush=True)
        warm = ts[1:] if len(ts) > 1 else ts
        print(
            f"{name}: median_warm={statistics.median(warm):.3f}s "
            f"spread=[{min(warm):.3f},{max(warm):.3f}] cold={ts[0]:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
