"""Capture .explain('formatted') snapshots for declared queries.

Usage: python scripts/capture_plans.py <suffix> [query ...]

Writes plans/r11/<query>_<suffix>.txt for each named query (default: the
round-11 optimization target set). The DataFrame is BUILT, not executed —
but iterative drivers (pagerank, components, the streaming corpus pass)
run their loop jobs during construction; that is inherent to capturing
their final plan and does not touch the bench artifacts.

The round-11 judge checks plan claims (Exchange counts, join strategies,
PushedFilters) against these files, so they are committed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

DEFAULT_TARGETS = [
    "corpus_prepare_stream",
    "media_pair_dedup_trimodal",
    "media_pair_dedup",
    "dedup_components_incr",
    "dedup_substring_incr",
    "corpus_prepare_full",
    "graph_pagerank",
    "graph_label_prop",
    "dedup_components_star",
    "docs_leakage_split",
    "records_entity_resolution",
    "records_entity_pairs",
    "docs_ccnet_buckets",
    "docs_dsir_select",
    "docs_unigram_tokens",
    "docs_unigram_vocab",
    "dedup_simhash_pairs",
    "embedding_semdedup",
    "dedup_spans",
    "dedup_substring_spans",
    "docs_fuzzy_decontamination",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_TARGETS

    from metric_store_release_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from metric_store_release_spark.pipeline.dedup import release_index_cache

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"capture:{name}")
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        release_index_cache(df)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
