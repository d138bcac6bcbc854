"""Physical-plan introspection — makes the scale contract testable.

The build rules every operator here follows (and tests/test_plans.py
asserts) are:
  1. filters and projections reach the parquet scan (PushedFilters /
     ReadSchema show only what's needed);
  2. small dimensions join via BroadcastHashJoin, never a shuffled join;
  3. aggregations are partial+final (map-side combine), visible as two
     HashAggregate nodes around one Exchange;
  4. no more Exchange nodes than the operator semantically needs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange (shuffle) nodes in the physical plan.
    AQE may later coalesce them, but plan-time count is the upper bound the
    operator author is accountable for."""
    plan = physical_plan(df)
    # formatted explain lists each node in the tree AND a "(n) Exchange"
    # detail section — count the detail headers only
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column sets read by each parquet scan (from ReadSchema) — the
    column-pruning check."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        out.append(cols)
    return out


def scans_by_table(df: DataFrame) -> dict[str, int]:
    """Parquet scan-node count per table file — the duplicate-fact-scan
    detector. Checkpointed/cached inputs contribute no parquet scans."""
    out: dict[str, int] = {}
    pat = re.compile(
        r"^\(\d+\) Scan parquet\b.*\n(?:.*\n)*?Location.*?\[file:(.*?)\]",
        flags=re.MULTILINE,
    )
    for m in pat.finditer(physical_plan(df)):
        t = m.group(1).rsplit("/", 1)[-1].removesuffix(".parquet")
        out[t] = out.get(t, 0) + 1
    return out


def unpartitioned_windows(df: DataFrame) -> int:
    """Number of Window nodes with NO partition spec — each one funnels its
    whole input through a single task (rule 4's worst offender). A formatted
    Window detail block reads `Arguments: [fns], [partCols], [orderCols]`
    when partitioned and `Arguments: [fns], [orderCols]` when not: count the
    blocks with only two top-level bracket groups."""
    plan = physical_plan(df)
    n = 0
    for m in re.finditer(
        r"^\(\d+\) Window\n(?:.*\n)*?Arguments: (\[.*)$", plan, flags=re.MULTILINE
    ):
        args, depth, groups = m.group(1), 0, 0
        for ch in args:
            if ch == "[":
                if depth == 0:
                    groups += 1
                depth += 1
            elif ch == "]":
                depth -= 1
        if groups == 2:
            n += 1
    return n
