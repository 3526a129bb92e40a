"""PromQL logic-test corpus `load` notation → samples DataFrame.

The upstream corpus (vendor/.../promql/testdata/*.test) loads series as

    load 5m
      http_requests{job="api-server", instance="0", group="production"} 0+10x10
      other_metric{} 1 2 3 _ stale 5

value notation: `a+bxN` arithmetic series (a, a+b, … a+Nb at t = i·step),
literal numbers, `_` = missing sample, `stale` = staleness marker. Timestamps
anchor at epoch 0, matching `eval instant at 50m` in the corpus. This module
reimplements that notation (vendor promql/parser/parse.go parseSeriesDesc
semantics) so corpus cases can be ported as pytest cases.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from metric_store_release_spark.datamodel import SAMPLES_SCHEMA

_SERIES_RE = re.compile(
    r"^\s*(?P<name>[a-zA-Z_:][a-zA-Z0-9_:]*)?\s*(?:\{(?P<labels>[^}]*)\})?\s+(?P<values>.+)$"
)
_LABEL_RE = re.compile(r'\s*([a-zA-Z_][a-zA-Z0-9_]*)\s*=\s*"([^"]*)"\s*,?')
_EXPAND_RE = re.compile(r"^(-?[0-9.e+Ee-]+)\+(-?[0-9.e+Ee-]+)x([0-9]+)$")
_SUB_RE = re.compile(r"^(-?[0-9.e+Ee-]+)-(-?[0-9.e+Ee-]+)x([0-9]+)$")
_REPEAT_RE = re.compile(r"^(-?[0-9.eE+-]*[0-9.]|[+-]?[iI]nf|[nN]a[nN])x([0-9]+)$")
_BLANK_REPEAT_RE = re.compile(r"^_x([0-9]+)$")


def parse_series(line: str) -> tuple[str, dict[str, str], list[tuple[int, float | None, bool]]]:
    """→ (name, labels, [(idx, value|None, stale)])."""
    m = _SERIES_RE.match(line)
    if not m:
        raise ValueError(f"bad series line: {line!r}")
    name = m.group("name") or ""
    labels = dict(_LABEL_RE.findall(m.group("labels") or ""))
    out: list[tuple[int, float | None, bool]] = []
    i = 0
    for tok in m.group("values").split():
        em = _EXPAND_RE.match(tok) or _SUB_RE.match(tok)
        if em and "x" in tok:
            a, b, n = float(em.group(1)), float(em.group(2)), int(em.group(3))
            if _SUB_RE.match(tok) and not _EXPAND_RE.match(tok):
                b = -b
            for j in range(n + 1):
                out.append((i, a + j * b, False))
                i += 1
            continue
        rm = _REPEAT_RE.match(tok)
        if rm:  # 'vxN' = v repeated N+1 times ('0x10' is this, NOT hex)
            v, n = _number(rm.group(1)), int(rm.group(2))
            for _ in range(n + 1):
                out.append((i, v, False))
                i += 1
            continue
        if tok == "_":
            i += 1
            continue
        bm = _BLANK_REPEAT_RE.match(tok)
        if bm:  # '_xN' = N+1 missing samples
            i += int(bm.group(1)) + 1
            continue
        if tok == "stale":
            out.append((i, 0.0, True))
            i += 1
            continue
        out.append((i, _number(tok), False))
        i += 1
    return name, labels, out


def _number(tok: str) -> float:
    """Series values take the Go strconv forms the corpus uses: decimals
    and Inf/NaN keywords."""
    t = tok.lower().lstrip("+")
    if t in ("inf", "infinity"):
        return float("inf")
    if t in ("-inf", "-infinity"):
        return float("-inf")
    if t == "nan":
        return float("nan")
    return float(tok)


def load(spark: SparkSession, step_ms: int, series: list[str]) -> DataFrame:
    """Corpus `load <step>` block → samples DataFrame (ts anchored at 0)."""
    rows = []
    for line in series:
        name, labels, points = parse_series(line)
        for idx, value, stale in points:
            rows.append((idx * step_ms, name, float(value), labels, stale))
    return spark.createDataFrame(rows, SAMPLES_SCHEMA)


MIN = 60_000  # corpus convenience: `5 * MIN` = eval instant at 5m
