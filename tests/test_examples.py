"""Smoke the end-to-end example pipelines at sf0.001: they are the
composition showcase (and the only place some operator SEQUENCES run
together), so they get executed in CI, not just read.  Each runs as a
subprocess — the examples own their SparkSession lifecycle."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("FMX_TEST_SF_DIR", "/root/testdata/sf0.001")

# r13 verdict #2 (driver verify window): the examples are demo
# compositions, each a multi-minute subprocess with its own
# SparkSession (~6 min of the default suite together).  The default
# tier keeps ONE representative end-to-end composition
# (corpus_pipeline — the flagship LLM-data funnel, also the slowest
# single stage sequence); the rest run under FMX_FULL_SUITE=1, which
# the builder runs before every round close.
full_suite_only = pytest.mark.skipif(
    os.environ.get("FMX_FULL_SUITE") != "1",
    reason="example smoke: FMX_FULL_SUITE=1 tier")


def _run(script: str, *args: str) -> str:
    # 1200 s, not 600: the corpus example walls ~4 min ALONE on a quiet
    # host (bisect r13: 3m43 at the r12-close commit a835f43 vs 3m56 at
    # HEAD — no regression, ~930 scheduling-floor stages at sf0.001),
    # and inside the full suite a session-fixture JVM shares the host
    # with this subprocess, which twice pushed it past 600 s.
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), SF, *args],
        capture_output=True, text=True, timeout=1200, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_corpus_pipeline_runs_end_to_end(tmp_path):
    stdout = _run("corpus_pipeline.py", str(tmp_path / "out"))
    # every stage reports, the funnel only ever shrinks, and the final
    # write happened
    assert "decontaminated" in stdout
    assert "wrote" in stdout
    nums = [int(tok) for tok in stdout.replace("->", " ").split()
            if tok.isdigit()]
    stages = nums[:9]
    assert all(a >= b for a, b in zip(stages, stages[1:])), stages


@full_suite_only
def test_incremental_ingest_runs_end_to_end():
    stdout = _run("incremental_ingest.py")
    assert stdout.count("day ") == 3
    assert "compacted store" in stdout
    # day 0 seeds the store; later days must drop SOME near-dups on
    # this synthetic corpus (cross-day templates repeat)
    assert "near-dup-clean" in stdout


@full_suite_only
def test_vector_search_example_runs(tmp_path):
    stdout = _run("vector_search.py")
    assert "recall" in stdout.lower()


@full_suite_only
def test_streaming_pipeline_example_runs(tmp_path):
    stdout = _run("streaming_pipeline.py", str(tmp_path / "out"))
    assert stdout.strip()  # completed without error and reported


@full_suite_only
def test_hybrid_search_example_runs(tmp_path):
    stdout = _run("hybrid_search.py")
    assert "fused recall" in stdout


@full_suite_only
def test_experimentation_example_runs(tmp_path):
    stdout = _run("experimentation.py")
    assert "bootstrap" in stdout and "guardrail" in stdout


@full_suite_only
def test_data_selection_example_runs(tmp_path):
    stdout = _run("data_selection.py")
    assert "Pareto frontier" in stdout and "matched en/de pairs" in stdout


@full_suite_only
def test_tabular_features_example_runs(tmp_path):
    stdout = _run("tabular_features.py")
    assert "leakage-free" in stdout and "val MAE" in stdout
    assert "5-fold MAE" in stdout and "quartile sizes" in stdout


@full_suite_only
def test_monitoring_example_runs(tmp_path):
    stdout = _run("monitoring.py")
    assert "monitoring pass complete" in stdout
    assert "changed keys" in stdout and "srm:" in stdout
    assert "freshness:" in stdout


@full_suite_only
def test_engagement_report_example_runs():
    stdout = _run("engagement_report.py")
    # every section reports
    for marker in ("growth:", "stickiness:", "churn:", "survival",
                   "streaks:", "transitions:", "burstiness:"):
        assert marker in stdout, marker
    # the KM curve is monotone non-increasing in the printed head
    import re
    surv = [float(x) for x in re.findall(r"S\(\d+\)=([0-9.]+)", stdout)]
    assert all(a >= b for a, b in zip(surv, surv[1:])), surv


@full_suite_only
def test_entity_resolution_example_runs():
    stdout = _run("entity_resolution.py")
    assert "EM pattern posteriors" in stdout
    assert "precision=" in stdout
