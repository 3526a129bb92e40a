"""The upstream PromQL logic-test corpus, executed end-to-end.

SURVEY §5 names this corpus — vendor/github.com/prometheus/prometheus/
promql/testdata/*.test, the exact files the reference's vendored engine is
tested against (vendor promql/promql_test.go:33-40 runs the whole builtin
testdata dir) — as the correctness authority for the query language. Every
`eval` / `eval_fail` / `eval_ordered` case in every in-scope file runs here
through PromQLEngine via tests/corpus_runner.py, compared with the
harness's almostEqual (test.go:667-684).

Admission is disabled for these runs (EngineConfig(max_samples=None)):
the corpus tests query semantics, not the production envelope, and the
in-plan guard would only double work on these tiny in-memory loads.

Skip policy: zero unexplained skips. Whole files excluded from the run
must appear in SKIPPED_FILES with a reason; per-expression skips live in
the per-file dict (currently empty — every expression in every in-scope
file passes). `test_corpus_dir_fully_accounted` enforces the policy
against the corpus directory itself, so a new file appearing in a vendor
bump cannot be silently ignored.
"""

from __future__ import annotations

import pytest

from corpus_runner import TESTDATA, parse_test_file, run_file

from metric_store_release_spark import EngineConfig, PromQLEngine

#: file → {expr (or 'expr @ <at_ms>') → skip reason}; empty dict = run all
CORPUS_FILES: dict[str, dict[str, str]] = {
    "literals.test": {},
    "selectors.test": {},
    "staleness.test": {},
    "operators.test": {},
    "aggregators.test": {},
    "functions.test": {},
    "subquery.test": {},
    "at_modifier.test": {},
    "collision.test": {},
    "trig_functions.test": {},
    "histograms.test": {},
}

#: whole-file exclusions, each with the reference-derived reason
SKIPPED_FILES: dict[str, str] = {
    "native_histograms.test": (
        "reference rejects native histograms at ingest — the appender stubs "
        "AppendHistogram (src/pkg/persistence/appender.go:88-101), so no "
        "native-histogram sample can exist in the store"
    ),
}


@pytest.fixture(scope="module")
def corpus_engine(spark):
    return PromQLEngine(spark, EngineConfig(max_samples=None))


@pytest.mark.parametrize("fname", sorted(CORPUS_FILES))
def test_corpus_file(spark, corpus_engine, fname):
    skips = CORPUS_FILES[fname]
    run = run_file(spark, fname, skips=skips, engine=corpus_engine)
    total = len(parse_test_file(TESTDATA / fname))
    tally = (
        f"{fname}: {run.passed}/{total} passed, "
        f"{len(run.skipped)} skipped, {len(run.failures)} FAILED"
    )
    print(tally)
    assert not run.failures, tally + "\n" + "\n\n".join(run.failures[:10])
    # every skip must map to a declared reason (run_file only skips from the
    # dict, but guard against a stale dict entry matching nothing)
    assert run.passed + len(run.skipped) == total


def test_corpus_dir_fully_accounted():
    """Every .test file in the vendored corpus is either run or explicitly
    skipped with a reason — a vendor bump cannot silently drop coverage."""
    on_disk = {p.name for p in TESTDATA.glob("*.test")}
    accounted = set(CORPUS_FILES) | set(SKIPPED_FILES)
    assert on_disk == accounted, (
        f"unaccounted corpus files: {sorted(on_disk - accounted)}; "
        f"declared but missing: {sorted(accounted - on_disk)}"
    )
