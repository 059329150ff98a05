"""Physical-plan introspection.

The reference has no optimizer to introspect (SURVEY.md §4 — all its
optimization is hand-rolled inside operators); on Spark the plan IS the
performance contract, so this module exposes it as data.  Used by the
perf test-suite to pin the properties that matter at 100 TB:

* filters/column pruning reach the parquet scan (``pushed_filters``,
  ``scan_columns``),
* the number of shuffles a verb costs (``shuffle_count``),
* small dimensions broadcast instead of shuffling the fact side
  (``broadcast_join_count``),
* expressions stay inside whole-stage codegen (``codegen_stage_count``).

Pure driver-side string/plan inspection — never executes the plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "executed_plan",
    "shuffle_count",
    "broadcast_join_count",
    "codegen_stage_count",
    "pushed_filters",
    "read_schema",
    "scan_columns",
    "scale_report",
    "generate_fed_broadcasts",
]


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-optimization, pre-execution).

    AdaptiveSparkPlan prints the current plan followed by an
    ``== Initial Plan ==`` section; keep only the current plan so node
    counts aren't doubled."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle boundaries (Exchange operators) in the plan.
    Every one is a full network redistribution of its input — the
    dominant cost at scale."""
    plan = executed_plan(df)
    # count Exchange nodes, excluding reused ones (no extra shuffle)
    return len(re.findall(r"\bExchange\b", plan)) - len(
        re.findall(r"\bReusedExchange\b", plan)
    )


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast joins (small side replicated, no fact-side
    shuffle)."""
    plan = executed_plan(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider is better (more of the
    plan fused into generated JVM code).  The plan printer renders a
    span either as a ``WholeStageCodegen`` node or as a ``*(n)``
    operator prefix; count distinct span ids across both forms."""
    plan = executed_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scan (empty list = full scan +
    post-filter; at 100 TB that is the difference between reading one
    row-group and reading everything)."""
    out: list[str] = []
    # the plan printer truncates long filter lists with '...' before the
    # closing bracket — accept either terminator
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|\.\.\.)", executed_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """The struct fields each scan actually reads (column pruning
    evidence)."""
    out: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", executed_plan(df)):
        out.append(m.group(1))
    return out


def scan_columns(df: DataFrame) -> set[str]:
    """Union of column names read by all scans in the plan."""
    cols: set[str] = set()
    for schema in read_schema(df):
        for field in schema.split(","):
            if ":" in field:
                cols.add(field.split(":")[0].strip())
    return cols


def generate_fed_broadcasts(df: DataFrame) -> int:
    """Number of ``BroadcastExchange`` nodes whose build subtree
    contains a ``Generate`` (explode) node.

    Catalyst's static size estimation does NOT grow through Generate or
    the Aggregate above it, so an explode-derived frame (a pair stream,
    a shingle table) can be estimated under the 10 MB broadcast
    threshold while its true size is gigabytes — the static planner
    then builds it as a broadcast hash relation and OOMs the driver
    (found live: ngram_jaccard_pairs' capped branch at ~sf1).  Any
    non-zero count deserves either a ``hint("merge")`` on the big side
    or a documented boundedness argument (e.g. a k-row centroid or
    bench-shingle attach that happens to pass through an explode)."""
    lines = executed_plan(df).splitlines()

    def depth(line: str) -> int:
        m = re.search(r"[+:]- ", line)
        if m:
            return m.start()
        return len(line) - len(line.lstrip(" :*"))

    hits = 0
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depth(line)
        for sub in lines[i + 1:]:
            if sub.strip() and depth(sub) <= d and re.search(r"[+:]- ", sub):
                break
            if "Generate" in sub:
                hits += 1
                break
    return hits


def scale_report(df: DataFrame) -> dict:
    """One-call scale audit of a plan: the numbers a reviewer asks for
    before letting a query near 100 TB.

    Returns ``{shuffles, broadcast_joins, codegen_stages,
    pushed_filters, scan_columns, cartesian}`` — ``cartesian`` flags
    any CartesianProduct / BroadcastNestedLoopJoin node (legitimate
    only for bounded 1-row broadcast attaches; anything else is the
    quadratic join this library spends most of its design avoiding).
    Driver-side plan inspection only; never executes the query.
    """
    plan = executed_plan(df)
    return {
        "shuffles": shuffle_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "codegen_stages": codegen_stage_count(df),
        "pushed_filters": pushed_filters(df),
        "scan_columns": sorted(scan_columns(df)),
        "cartesian": bool(
            re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan)
        ),
    }
