"""Physical-plan linter: the 100 TB scale-killer checklist as code.

``lint_plan(df)`` inspects a DataFrame's physical plan (never executes
it) and returns structured findings for the patterns that are harmless
at test scale and fatal at cluster scale:

- ``cartesian``      CartesianProduct / BroadcastNestedLoopJoin —
                     O(n*m) pair generation
- ``python-udf``     BatchEvalPython (row-at-a-time Python) in the
                     plan; ArrowEvalPython is reported separately as
                     ``arrow-udf`` (10-100x faster, still off the
                     codegen path)
- ``global-window``  a Window with an empty partition spec — every
                     row through ONE task
- ``global-sort``    a global Sort in a plan with no
                     TakeOrderedAndProject — full-data range shuffle
                     where a top-k heap (or no sort) would do
- ``unpushed-scan``  a parquet scan with PushedFilters empty while a
                     Filter node references that scan's columns —
                     predicate pushdown lost
- ``wide-scan``      a parquet ReadSchema wider than
                     ``wide_scan_cols`` columns (default 12) —
                     projection pruning probably lost

The linter is a heuristic reviewer: a finding is a prompt to look, not
proof of a bug (a global sort feeding an ordered writer is sometimes
the point), and a clean report does not make a plan fast.  It encodes
the same checklist the per-query plan tests (tests/test_plans.py) pin
one query at a time, as a reusable audit any pipeline can run over its
own DataFrames before submitting them at scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["lint_plan", "Finding"]


@dataclass
class Finding:
    code: str
    detail: str

    def __str__(self) -> str:          # readable in assertion output
        return f"[{self.code}] {self.detail}"


def _formatted(df: DataFrame) -> str:
    """Full (untruncated) formatted explain — the simple plan string
    truncates long FileScan lines mid-attribute."""
    jqe = df._jdf.queryExecution()
    mode = (df.sparkSession._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
    return jqe.explainString(mode)


def lint_plan(df: DataFrame, wide_scan_cols: int = 12) -> list[Finding]:
    """Return scale-risk findings for ``df``'s physical plan (empty
    list = clean)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    fmt = _formatted(df)
    out: list[Finding] = []

    for pat, code, msg in [
        ("CartesianProduct", "cartesian",
         "cartesian product: O(n*m) pair generation"),
        ("BroadcastNestedLoopJoin", "cartesian",
         "nested-loop join: per-row scan of the broadcast side"),
        ("BatchEvalPython", "python-udf",
         "row-at-a-time Python UDF in the hot path"),
        ("ArrowEvalPython", "arrow-udf",
         "Arrow-batched Python stage (off the codegen path)"),
        ("MapInPandas", "arrow-udf",
         "Arrow-batched mapInPandas stage (off the codegen path)"),
        ("FlatMapGroupsInPandas", "arrow-udf",
         "Arrow-batched grouped-pandas stage (off the codegen path)"),
    ]:
        n = plan.count(pat)
        if n:
            out.append(Finding(code, f"{msg} ({n}x)"))

    # global window: the Window node prints "[fns], [part], [ord]" when
    # both specs exist, and two groups when one is absent — the second
    # group is an ORDER spec (contains ASC/DESC sort directions) only
    # when the partition spec is empty.  A partitioned-but-unordered
    # window (running per-group aggregates) is NOT global.
    for ln in plan.splitlines():
        s = ln.strip().lstrip("+-: *(").rstrip(")")
        if not s.startswith("Window "):
            continue
        groups = _bracket_groups(ln)
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            out.append(Finding(
                "global-window",
                "window with no PARTITION BY: all rows in one task"))

    # global sort without a limit: "Sort [...], true, 0" (the bare
    # bool after the order spec is the global flag)
    if "TakeOrderedAndProject" not in plan:
        if re.search(r"\bSort \[[^\n]*\], true, \d", plan):
            out.append(Finding(
                "global-sort",
                "global sort without limit: full-data range shuffle"))

    # scans: pushdown + width, from the formatted node details
    scans = _scan_blocks(fmt)
    filter_refs = set()
    for m in re.finditer(r"\(\d+\) Filter[^\n]*\n(?:[^\n]+\n)*?"
                         r"Condition : ([^\n]+)", fmt):
        filter_refs.update(re.findall(r"#(\d+)", m.group(1)))
    for outputs, pushed, schema in scans:
        if schema:
            ncols = schema.count(",") + 1
            if ncols > wide_scan_cols:
                out.append(Finding(
                    "wide-scan",
                    f"scan reads {ncols} columns — projection pruning "
                    f"lost?"))
        if not pushed.strip() and outputs & filter_refs:
            out.append(Finding(
                "unpushed-scan",
                "scan has no pushed filters but a Filter references "
                "its columns"))
    return out


def _scan_blocks(fmt: str) -> list[tuple[set, str, str]]:
    """(output exprIds, PushedFilters body, ReadSchema body) per
    'Scan parquet' node in a formatted explain."""
    blocks = []
    # node detail sections are separated by blank lines — parse each
    # scan section on its own so a missing PushedFilters line (scan
    # pushed nothing) can't make the regex bleed into the next node
    for section in re.split(r"\n\s*\n", fmt):
        if not re.match(r"\s*\(\d+\) Scan parquet", section):
            continue
        outm = re.search(r"Output \[\d+\]: \[([^\]]*)\]", section)
        pushm = re.search(r"PushedFilters: \[([^\]]*)\]", section)
        schm = re.search(r"ReadSchema: struct<([^\n]*)", section)
        ids = set(re.findall(r"#(\d+)", outm.group(1))) if outm else set()
        blocks.append((ids, pushm.group(1) if pushm else "",
                       schm.group(1) if schm else ""))
    return blocks


def _bracket_groups(line: str) -> list[str]:
    """Top-level [...] groups of a plan line (nested brackets folded)."""
    groups, depth, cur = [], 0, []
    for ch in line:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups
