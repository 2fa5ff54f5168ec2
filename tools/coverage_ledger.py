"""Driver-evidence ledger: regenerate the COVERAGE.md rotation section
from CORRECTNESS_r*.json + the live registry (r7 verdict #7 — the
per-round window bookkeeping was hand-computed prose; now it's
generated).

Usage::

    python -m tools.coverage_ledger            # rewrite COVERAGE.md section
    python -m tools.coverage_ledger --print    # stdout only

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
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- coverage-ledger:begin -->"
END = "<!-- coverage-ledger:end -->"


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
    args = ap.parse_args()
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
    print(f"updated {path}")


if __name__ == "__main__":
    main()
