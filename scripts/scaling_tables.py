"""Render the SCALING.md headline + per-query tables from three bench
JSONs (sf0.1, sf1, sf10) so a scale refresh is mechanical:

    python scripts/scaling_tables.py BENCH_r06.json BENCH_SF1.json BENCH_SF10.json

Prints markdown to stdout; paste over the corresponding SCALING.md
sections (the prose stays hand-written — it is the analysis, not the
numbers)."""

import json
import sys


def main(p01: str, p1: str, p10: str) -> None:
    b01, b1, b10 = (json.load(open(p)) for p in (p01, p1, p10))
    n = len(b01["queries"])
    print(f"| | sf0.1 | sf1 (10x) | sf10 (100x) | 100x ratio |")
    print("|---|---|---|---|---|")
    print(
        "| rows: events / lineitem / docs | 100k / 600k / 5k | 1M / 6M / 50k"
        " | 10M / 60M / 500k | 100x |"
    )
    for label, key in (
        (f"warm median total (s), {n} entries", "value"),
        ("warm best total (s)", "best_total"),
        ("cold (run1) total (s)", "run1_total"),
    ):
        v01, v1, v10 = b01[key], b1[key], b10[key]
        print(
            f"| {label} | {v01:.1f} | {v1:.1f} | {v10:.1f} |"
            f" **{v10 / v01:.1f}x** |"
        )
    ing = [round(b["ingest_points_per_sec"]) for b in (b01, b1, b10)]
    print(
        f"| streaming ingest (points/s, fixed-size probe) | {ing[0]:,} |"
        f" {ing[1]:,} | {ing[2]:,} | — (~{ing[2] // 128}x the 128 pts/s"
        " reference envelope) |"
    )
    print()
    print(f"Per-query warm median (s), sf0.1 → sf1 → sf10 ({n} entries):")
    print()
    print("| query | sf0.1 | sf1 | sf10 | sf10 spread |")
    print("|---|---|---|---|---|")
    for q in b01["queries"]:
        lo, hi = b10["spread"][q]
        print(
            f"| {q} | {b01['queries'][q]:.2f} | {b1['queries'][q]:.2f} |"
            f" {b10['queries'][q]:.2f} | [{lo:.2f}, {hi:.2f}] |"
        )


if __name__ == "__main__":
    main(*sys.argv[1:4])
