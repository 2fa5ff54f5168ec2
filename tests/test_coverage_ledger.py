"""CI pin for the coverage ledger (r11 verdict #7/#8): the
evidence-age gate passes, first-seen stamps exist for every entry, and
the hand-visible registry counts in README/COVERAGE match the live
registry (one source of truth — counts drifted three times inside
round 11)."""

import json
import re

import fmx.queries as Q
from tools.coverage_ledger import (FIRST_SEEN, evidence_age_failures,
                                   load_driver_rows, load_first_seen,
                                   rotation_period)

REG = Q.all_queries()


def test_evidence_age_gate():
    driver = load_driver_rows()
    latest_round = max((r for rs in driver.values() for r in rs), default=0)
    latest = {n: (max(rs), rs[max(rs)]) for n, rs in driver.items()}
    seen = load_first_seen()
    fails = evidence_age_failures(REG, latest, latest_round, seen)
    assert not fails, "\n".join(fails)


def test_first_seen_covers_registry():
    seen = load_first_seen()
    missing = [n for n in REG if n not in seen]
    assert not missing, (
        f"run `python -m tools.coverage_ledger` to stamp: {missing}")


def test_readme_and_coverage_counts_match_registry():
    total, oracled = len(REG), sum(1 for s in REG.values() if s.oracle)
    readme = open("README.md").read()
    m = re.search(r"enumerates the (\d+) registered queries", readme)
    assert m and int(m.group(1)) == total, "README --list count drifted"
    m = re.search(r"\| (\d+) registered queries", readme)
    assert m and int(m.group(1)) == total, "README table count drifted"
    m = re.search(r"DuckDB oracle SQL \((\d+)/(\d+);", readme)
    assert m and (int(m.group(1)), int(m.group(2))) == (oracled, total), \
        "README oracle-count drifted"
    cov = open("COVERAGE.md").read()
    m = re.search(r"Registry size as of round \d+: \*\*(\d+) queries, "
                  r"(\d+) with full", cov)
    assert m and (int(m.group(1)), int(m.group(2))) == (total, oracled), \
        "COVERAGE.md registry-size line drifted"


def test_rotation_period_is_window_feasible():
    # the staleness gate must never demand more freshness than a
    # 50-slot window can mathematically deliver
    assert rotation_period(REG) >= -(-sum(
        1 for s in REG.values() if s.oracle) // 50)
