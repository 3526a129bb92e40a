"""Automated runner for the vendored PromQL logic-test corpus.

Parses vendor/.../promql/testdata/*.test files (the exact semantic spec the
reference's engine is tested against — vendor promql/test.go) and executes
every `eval instant` / `eval_fail instant` / `eval_ordered instant` case
against PromQLEngine, comparing with the harness's almostEqual (relative
epsilon 1e-6, test.go:667-684).

File grammar (test.go:149-238):
    load <step>            — series lines accumulate into storage
    clear                  — wipe storage
    eval instant at <t> <expr>
        <expected series lines, or none for an empty result>
    eval_fail …            — evaluation must error
    eval_ordered …         — result order must match (sort queries)
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from pathlib import Path

from metric_store_release_spark import EngineConfig, PromQLEngine
from metric_store_release_spark.promql.lexer import parse_duration_ms
from metric_store_release_spark.sources import corpus

TESTDATA = Path(
    "/root/reference/vendor/github.com/prometheus/prometheus/promql/testdata"
)

_EVAL_RE = re.compile(r"^eval(_fail|_ordered)?\s+instant\s+at\s+(\S+)\s+(.*)$")
_NUM_RE = re.compile(r"^[+-]?(inf|nan|[0-9.][0-9.eE+-]*)$", re.IGNORECASE)


@dataclass
class EvalCase:
    kind: str  # "" | "_fail" | "_ordered"
    at_ms: int
    expr: str
    expected: list[tuple[dict, float]] | None  # None for eval_fail
    lineno: int
    loads: tuple  # ((step_ms, (series lines…)), …) storage state


def _parse_number(tok: str) -> float:
    t = tok.lower().lstrip("+")
    if t in ("inf", "infinity"):
        return math.inf
    if t in ("-inf", "-infinity"):
        return -math.inf
    if t == "nan":
        return math.nan
    return float(tok)


def _parse_expected(lines: list[str]) -> list[tuple[dict, float]]:
    out = []
    for ln in lines:
        if _NUM_RE.match(ln.strip()):
            out.append(({}, _parse_number(ln.strip())))  # scalar expectation
            continue
        name, labels, vals = corpus.parse_series(ln)
        if name:
            labels = {"__name__": name, **labels}
        assert len(vals) == 1, f"instant expectation with {len(vals)} values: {ln!r}"
        _, v, _stale = vals[0]
        out.append((labels, v))
    return out


def parse_test_file(path: Path) -> list[EvalCase]:
    cases: list[EvalCase] = []
    loads: list[tuple[int, tuple[str, ...]]] = []
    lines = path.read_text().splitlines()
    i = 0
    while i < len(lines):
        ln = lines[i].strip()
        if not ln or ln.startswith("#"):
            i += 1
            continue
        if ln == "clear":
            loads = []
            i += 1
            continue
        if ln.startswith("load"):
            step_ms = parse_duration_ms(ln.split()[1])
            series: list[str] = []
            i += 1
            while i < len(lines) and lines[i].strip() and not lines[i].strip().startswith("#") and (lines[i][:1] in (" ", "\t")):
                series.append(lines[i].strip())
                i += 1
            loads.append((step_ms, tuple(series)))
            continue
        m = _EVAL_RE.match(ln)
        if m:
            kind = m.group(1) or ""
            at_ms = parse_duration_ms(m.group(2)) if m.group(2) != "0" else 0
            expr = m.group(3)
            expected_lines: list[str] = []
            i += 1
            while i < len(lines) and lines[i].strip() and not lines[i].strip().startswith("#") and (lines[i][:1] in (" ", "\t")):
                expected_lines.append(lines[i].strip())
                i += 1
            cases.append(
                EvalCase(
                    kind=kind,
                    at_ms=at_ms,
                    expr=expr,
                    expected=None if kind == "_fail" else _parse_expected(expected_lines),
                    lineno=len(cases),
                    loads=tuple(loads),
                )
            )
            continue
        raise ValueError(f"{path.name}: unhandled line {ln!r}")
    return cases


def almost_equal(a: float, b: float) -> bool:
    """vendor promql/test.go:667-684."""
    if a is None or b is None:
        return False  # a NULL engine value is always a mismatch
    if math.isnan(a) and math.isnan(b):
        return True
    if a == b:
        return True
    eps = 1e-6
    min_normal = 2.2250738585072014e-308
    diff = abs(a - b)
    if a == 0 or b == 0 or diff < min_normal:
        return diff < eps * min_normal
    return diff / (abs(a) + abs(b)) < eps


@dataclass
class CorpusRun:
    passed: int = 0
    failures: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)


def run_file(
    spark,
    name: str,
    skips: dict[str, str] | None = None,
    engine: PromQLEngine | None = None,
) -> CorpusRun:
    """Run every eval in a corpus file; returns pass/fail/skip accounting.

    `skips` maps an exact expr (or 'expr @ <at>') to a reason."""
    eng = engine or PromQLEngine(spark, EngineConfig())
    skips = skips or {}
    run = CorpusRun()
    df_cache: dict[tuple, object] = {}
    for case in parse_test_file(TESTDATA / name):
        key_exact = f"{case.expr} @ {case.at_ms}"
        reason = skips.get(case.expr) or skips.get(key_exact)
        if reason:
            run.skipped.append(f"{case.expr!r}: {reason}")
            continue
        if case.loads not in df_cache:
            parts = [
                corpus.load(spark, step, list(series))
                for step, series in case.loads
            ]
            df = parts[0] if parts else corpus.load(spark, 60_000, [])
            for p in parts[1:]:
                df = df.unionByName(p)
            df_cache[case.loads] = df
        samples = df_cache[case.loads]
        label = f"{name}: eval{case.kind} at {case.at_ms}ms {case.expr!r}"
        try:
            rows = eng.query_instant(samples, case.expr, case.at_ms).collect()
        except Exception as e:
            if case.kind == "_fail":
                run.passed += 1
            else:
                run.failures.append(f"{label} raised {type(e).__name__}: {e}")
            continue
        if case.kind == "_fail":
            run.failures.append(f"{label} expected failure, got {len(rows)} rows")
            continue
        got = [(dict(r["labels"] or {}), r["value"]) for r in rows]
        want = case.expected or []
        if case.kind == "_ordered":
            ok = len(got) == len(want) and all(
                g[0] == w[0] and almost_equal(g[1], w[1])
                for g, w in zip(got, want)
            )
        else:
            ok = len(got) == len(want)
            if ok:
                unmatched = list(got)
                for w in want:
                    hit = next(
                        (
                            g
                            for g in unmatched
                            if g[0] == w[0] and almost_equal(g[1], w[1])
                        ),
                        None,
                    )
                    if hit is None:
                        ok = False
                        break
                    unmatched.remove(hit)
        if ok:
            run.passed += 1
        else:
            run.failures.append(f"{label}\n    want {want}\n    got  {got}")
    return run
