"""Render the SCALING.md per-query markdown table from three bench JSONs.

Usage: python scripts/scaling_table.py SF01.json SF1.json SF10.json
Prints the totals block and the per-query table (medians; sf10 spread).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    paths = sys.argv[1:4]
    b01, b1, b10 = (json.load(open(p)) for p in paths)
    names = list(b01["queries"])
    # round-7 sidecar format carries the offline-loop list explicitly;
    # fall back to the old spread-absence heuristic for older artifacts
    offline = b01.get(
        "offline", [n for n in names if n not in b01.get("spread", {})]
    )

    def tot(b, keys):
        return sum(b["queries"][k] for k in keys if k in b["queries"])

    serving = [n for n in names if n not in offline]
    print(f"entries: {len(names)} (sf0.1) / {len(b1['queries'])} (sf1) "
          f"/ {len(b10['queries'])} (sf10); offline-loop: {offline}")
    for label, keys in (("serving", serving), ("all", names)):
        print(
            f"| warm median total, {label} (s) "
            f"| {tot(b01, keys):.1f} | {tot(b1, keys):.1f} "
            f"| {tot(b10, keys):.1f} |"
        )
    for b, lbl in ((b01, "sf0.1"), (b1, "sf1"), (b10, "sf10")):
        print(f"{lbl}: run1_total={b.get('run1_total')} "
              f"best_total={b.get('best_total')} "
              f"ingest={b.get('ingest_points_per_sec')}")
    print()
    print("| query | sf0.1 | sf1 | sf10 | sf10 spread |")
    print("|---|---|---|---|---|")
    for n in names:
        q01 = b01["queries"].get(n)
        q1 = b1["queries"].get(n)
        q10 = b10["queries"].get(n)
        sp = b10.get("spread", {}).get(n)
        def f(x):
            return f"{x:.2f}" if x is not None else "—"
        sps = f"[{sp[0]:.2f}, {sp[1]:.2f}]" if sp else "—"
        print(f"| {n} | {f(q01)} | {f(q1)} | {f(q10)} | {sps} |")


if __name__ == "__main__":
    main()
