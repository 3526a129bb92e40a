"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "runs": N}.

Each query runs $SPARK_GRAFT_BENCH_RUNS times (default 2) and reports the
per-query BEST — one JVM-warm repeat removes most run-to-run variance
(JIT, page cache, executor spin-up) that otherwise pollutes round-over-
round comparisons without hiding real plan cost.

Query set: the heaviest representatives of each operator family — instant
selector fan-out + agg, rate over 1d windows, histogram_quantile, topk,
vector-vector join, subquery, TPC-H q1/q3, MinHash LSH, ANN top-k.
Baseline envelope (BASELINE.md): a ≤20e6-sample query must fit the 10-60 s
reference timeout at sf0.1 — each of these touches well under that cap.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from metric_store_release_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    bench_names = [
        "promql_sum_by_user",
        "promql_sum_by_user_federated",
        "promql_rate",
        "promql_topk",
        "promql_binop_add",
        "promql_histogram_quantile",
        "promql_subquery",
        "tpch_q1",
        "tpch_q3",
        "rollup_counter",
        "dedup_minhash_lsh",
        "embedding_topk",
        "text_quality",
        # added round 4 — totals are NOT comparable with BENCH_r0{1..3}
        # without subtracting these eight entries
        "dedup_substring",
        "embedding_kmeans",
        "text_repetition",
        "text_unigram_logprob",
        "docs_pack",
        "corpus_prepare",
        "ngram_contamination",
        "embedding_ann_trained",
        # added driver round 4 (commits mislabeled "round-5" then)
        "dedup_simhash_pairs",
        "text_bm25",
        "text_top_ngrams",
        "tpch_q10",
        "events_sessionize",
        "events_asof_join",
        "events_funnel",
        # added driver round 5: steady-state serving paths — the one-time
        # index / bucketed-table writes are untimed setup below, so these
        # measure the amortized per-query cost (probe-only ANN;
        # Exchange-free sessionize). Compare events_sessionize_bucketed
        # against events_sessionize for the bucketing payoff.
        "embedding_ann_probe",
        "events_sessionize_bucketed",
        # also round 5: bucket-decomposed range join, KMV distinct sketch,
        # 8-round distributed BPE merge training (force-trains per call)
        "events_interval_join",
        "events_kmv_users",
        "docs_bpe_merges",
    ]
    # warm the JVM + parquet footers with one tiny action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    # build the federated store untimed: the replicated write is input
    # setup, not query work (the plan it returns is NOT executed here)
    qs["promql_sum_by_user_federated"](spark, SF_DIR)
    # one-time index/table writes (bucketed IVF index, user-bucketed events)
    # are production setup amortized across queries — untimed, same rule
    qs["embedding_ann_probe"](spark, SF_DIR)
    qs["events_sessionize_bucketed"](spark, SF_DIR)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    best: dict[str, float] = {}
    run1: dict[str, float] = {}
    for r in range(runs):
        for name in bench_names:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            took = round(time.perf_counter() - t0, 3)
            best[name] = min(best.get(name, float("inf")), took)
            if r == 0:
                run1[name] = took
            print(f"# run{r + 1} {name}: {took}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    best_total = round(sum(best.values()), 3)
    run1_total = round(sum(run1.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": best_total,
                "unit": "sec",
                "queries": best,
                "sf": float(sf) if sf else None,
                "runs": runs,
                # cold (first-run) vs JVM-warm best, reported separately so
                # round-over-round comparisons don't mix methodology
                "run1_total": run1_total,
                "best_total": best_total,
                "run1_queries": run1,
            }
        )
    )


if __name__ == "__main__":
    main()
