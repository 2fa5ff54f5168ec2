"""Driver-evidence ledger: regenerate the COVERAGE.md rotation section
from CORRECTNESS_r*.json + the live registry (r7 verdict #7 — the
per-round window bookkeeping was hand-computed prose; now it's
generated).

Usage::

    python -m tools.coverage_ledger            # rewrite COVERAGE.md section,
                                               # sync README/COVERAGE counts,
                                               # stamp first-seen rounds
    python -m tools.coverage_ledger --print    # stdout only
    python -m tools.coverage_ledger --check    # exit 1 on stale evidence
                                               # (r11 verdict #7)

``--check`` fails when any oracle-able entry's newest driver row is
older than the ROTATION PERIOD — ceil(oracle-able entries / 50 window
slots) rounds, the mathematically best freshness a 50-row window can
sustain (the r11 verdict's 6-round aspiration is unsatisfiable at 437
entries; the gate instead detects the rotation falling behind its own
schedule) — or when an entry registered more than one round ago (per
``tools/registry_first_seen.json``) still has no driver row.

For every registry entry the ledger reports the most recent driver
round that checked it and whether that row was green; plus the age
histogram (how stale the evidence is), the union coverage, and the
never-driver-checked list (= next rotation stock).  The section is
maintained between the ``<!-- coverage-ledger:begin/end -->`` markers
so the rest of COVERAGE.md stays hand-written.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- coverage-ledger:begin -->"
END = "<!-- coverage-ledger:end -->"
FIRST_SEEN = os.path.join(REPO, "tools", "registry_first_seen.json")


def rotation_period(registry) -> int:
    """ceil(oracle-able entries / 50): the best sustainable evidence
    age given the driver's 50-row window."""
    oracle_able = sum(1 for s in registry.values() if s.oracle)
    return -(-oracle_able // 50)


def load_first_seen() -> dict[str, int]:
    if os.path.exists(FIRST_SEEN):
        with open(FIRST_SEEN) as f:
            return json.load(f)
    return {}


def stamp_first_seen(registry, latest_round: int) -> dict[str, int]:
    """Record, for every registry entry, the first ROUND whose window
    it could have joined (= the round after the latest CORRECTNESS
    file at stamp time).  Names already stamped keep their round."""
    seen = load_first_seen()
    changed = False
    for name in registry:
        if name not in seen:
            seen[name] = latest_round + 1
            changed = True
    if changed:
        with open(FIRST_SEEN, "w") as f:
            json.dump(dict(sorted(seen.items())), f, indent=0,
                      separators=(",", ": "))
            f.write("\n")
    return seen


def evidence_age_failures(registry, latest, latest_round: int,
                          seen: dict[str, int]) -> list[str]:
    """r11 verdict #7: the staleness gate.  Returns human-readable
    failure strings (empty = pass)."""
    fails = []
    max_age = rotation_period(registry)
    for name, spec in registry.items():
        if not spec.oracle:
            continue  # rows-only engine-private sketches: pytest-covered
        if name in latest:
            r, _ = latest[name]
            if latest_round - r > max_age:
                fails.append(f"{name}: newest driver row r{r:02d} is "
                             f"{latest_round - r} rounds old "
                             f"(max {max_age} = rotation period)")
        else:
            first = seen.get(name, latest_round + 1)
            if latest_round >= first + 1:
                fails.append(f"{name}: registered for r{first:02d} but "
                             f"still has no driver row after "
                             f"r{latest_round:02d}")
    return fails


def sync_counts(registry, latest_round: int) -> list[str]:
    """r11 verdict #8: every hand-maintained registry count in
    README.md / COVERAGE.md is regenerated from the live registry —
    one source of truth.  Returns the list of files touched.

    ``latest_round`` stamps the COVERAGE.md registry-size line (r12
    advice: a hardcoded round literal here silently re-dated every
    later round's line back to the round it was written in)."""
    total = len(registry)
    oracled = sum(1 for s in registry.values() if s.oracle)
    touched = []
    subs = {
        os.path.join(REPO, "README.md"): [
            (r"enumerates the \d+ registered queries",
             f"enumerates the {total} registered queries"),
            (r"\| \d+ registered queries",
             f"| {total} registered queries"),
            (r"DuckDB oracle SQL \(\d+/\d+;",
             f"DuckDB oracle SQL ({oracled}/{total};"),
        ],
        os.path.join(REPO, "COVERAGE.md"): [
            (r"Registry size as of round \d+: \*\*\d+ queries, "
             r"\d+ with full",
             f"Registry size as of round {latest_round}: "
             f"**{total} queries, {oracled} with full"),
        ],
    }
    for path, pats in subs.items():
        with open(path) as f:
            text = f.read()
        new = text
        for pat, rep in pats:
            new = re.sub(pat, rep, new)
        if new != text:
            with open(path, "w") as f:
                f.write(new)
            touched.append(os.path.basename(path))
    return touched


def load_driver_rows() -> dict[str, dict[int, bool]]:
    """name -> {round: green} across every CORRECTNESS_r*.json."""
    rows: dict[str, dict[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            if rec.get("err") == "no_oracle":
                # rows-only entry (no DuckDB oracle by design): the
                # driver records spark_rows only; green = it ran and
                # produced rows (each has an oracled portable twin)
                green = (rec.get("spark_rows") or 0) > 0
            else:
                green = (bool(rec.get("rows_match")) and not rec.get("err")
                         and rec.get("hash_match") is not False
                         and rec.get("schema_match") is not False)
            rows.setdefault(name, {})[rnd] = green
    return rows


def build_ledger() -> str:
    from fmx.queries import all_queries

    registry = all_queries()
    driver = load_driver_rows()
    latest_round = max((r for rs in driver.values() for r in rs), default=0)

    latest: dict[str, tuple[int, bool]] = {}
    for name, rs in driver.items():
        r = max(rs)
        latest[name] = (r, rs[r])

    covered = [n for n in registry if n in latest]
    never = [n for n in registry if n not in latest]
    red_latest = [n for n, (r, g) in latest.items() if not g and n in registry]
    stale_rows = {n: latest[n] for n in covered}
    age_hist = Counter(r for r, _ in stale_rows.values())
    headliners = {n for n, s in registry.items() if s.headline}

    lines = [BEGIN,
             "",
             f"### Driver-evidence ledger (generated, r01–r{latest_round:02d})",
             "",
             "Regenerate with `python -m tools.coverage_ledger` after each",
             "round's CORRECTNESS file lands.",
             "",
             f"- registry entries: **{len(registry)}** "
             f"({sum(1 for s in registry.values() if s.oracle)} oracled)",
             f"- union of driver rows covers: **{len(covered)}** "
             f"({len(never)} never driver-checked)",
             f"- entries whose LATEST driver row is red: "
             f"**{len(red_latest)}**"
             + (f" — {sorted(red_latest)}" if red_latest else ""),
             "",
             "Evidence age (most recent driver row per covered entry):",
             "",
             "| round | entries | of which bench headliners |",
             "|---|---|---|"]
    for r in sorted(age_hist):
        names = [n for n, (rr, _) in stale_rows.items() if rr == r]
        h = sum(1 for n in names if n in headliners)
        lines.append(f"| r{r:02d} | {len(names)} | {h} |")
    lines.append("")
    oldest = min(age_hist) if age_hist else 0
    if oldest and oldest < latest_round:
        names = sorted(n for n, (rr, _) in stale_rows.items()
                       if rr == oldest and n not in headliners)
        lines.append(f"Oldest non-headliner evidence (r{oldest:02d}) — "
                     f"refresh stock: {', '.join(names) if names else 'none'}")
        lines.append("")
    if never:
        lines.append(f"Never driver-checked (rotation stock, "
                     f"{len(never)}): {', '.join(sorted(never))}")
        lines.append("")
    lines.append(END)
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--print", action="store_true", dest="stdout_only")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        from fmx.queries import all_queries

        registry = all_queries()
        driver = load_driver_rows()
        latest_round = max((r for rs in driver.values() for r in rs),
                           default=0)
        latest = {n: (max(rs), rs[max(rs)]) for n, rs in driver.items()}
        seen = stamp_first_seen(registry, latest_round)
        hist = Counter(r for r, _ in latest.values())
        print("evidence-age histogram: "
              + ", ".join(f"r{r:02d}:{c}" for r, c in sorted(hist.items()))
              + f" | never:{sum(1 for n in registry if n not in latest)}"
              + f" | rotation period:{rotation_period(registry)}")
        fails = evidence_age_failures(registry, latest, latest_round, seen)
        if fails:
            print("evidence-age check FAILED:")
            for f_ in fails:
                print(" -", f_)
            sys.exit(1)
        print(f"evidence-age check ok (r{latest_round:02d}; "
              f"{len(registry)} entries)")
        return
    section = build_ledger()
    if args.stdout_only:
        print(section)
        return
    path = os.path.join(REPO, "COVERAGE.md")
    with open(path) as f:
        text = f.read()
    if BEGIN in text and END in text:
        pre, rest = text.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(path, "w") as f:
        f.write(text)
    from fmx.queries import all_queries

    registry = all_queries()
    driver = load_driver_rows()
    latest_round = max((r for rs in driver.values() for r in rs), default=0)
    stamp_first_seen(registry, latest_round)
    touched = sync_counts(registry, latest_round)
    print(f"updated {path}" + (f" + counts in {', '.join(touched)}"
                               if touched else ""))


if __name__ == "__main__":
    main()
