"""Physical-plan introspection helpers.

The reference's optimizations are hand-applied and invisible; ours come
from Catalyst, and these helpers make them ASSERTABLE: tests pin down that
column pruning, predicate pushdown, broadcast choices and top-k plans
actually materialized (SURVEY.md §4.1's table, turned into checks).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` as a string — unlike toString(), node details
    (PushedFilters, ReadSchema) are printed in full, not truncated."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class ScanInfo:
    read_columns: list[str] = field(default_factory=list)
    pushed_filters: str = ""
    partition_filters: str = ""


def parquet_scans(df: DataFrame) -> list[ScanInfo]:
    """Parse the formatted plan's Scan nodes: which columns are read, which
    filters pushed, which partitions pruned."""
    out: list[ScanInfo] = []
    info: ScanInfo | None = None
    for line in formatted_plan(df).splitlines():
        if re.match(r"\(\d+\) Scan parquet", line.strip()):
            info = ScanInfo()
            out.append(info)
            continue
        if info is None:
            continue
        s = line.strip()
        m = re.match(r"Output \[\d+\]: \[([^\]]*)\]", s)
        if m:
            info.read_columns = [c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()]
        m = re.match(r"PushedFilters: \[([^\]]*)", s)
        if m:
            info.pushed_filters = m.group(1)
        m = re.match(r"PartitionFilters: \[([^\]]*)", s)
        if m:
            info.partition_filters = m.group(1)
        if not s:  # blank line ends the node block
            info = None
    return out


def unpartitioned_window_count(df: DataFrame) -> int:
    """WindowExec nodes whose partitionSpec is EMPTY — every one of these
    funnels its whole input through a single task, the #1 false-scale
    pattern (WindowExec logs 'Moving all data to a single partition').
    Counted from the physical plan: Spark prints a partitioned window as
    `Window [exprs], [partSpec], [orderSpec]` and an unpartitioned one
    as `Window [exprs], [orderSpec]` — i.e. the SECOND top-level bracket
    group carries ASC/DESC when no partition spec exists. A window with
    BOTH specs empty (`count(*) over ()`) prints a SINGLE bracket group
    — it still funnels all rows to one task, so it is counted too
    (ADVICE r11: the empty-order gap)."""
    plan = physical_plan(df)
    n = 0
    for line in plan.splitlines():
        stripped = line.lstrip(" :+-*(0123456789)")
        if not stripped.startswith("Window "):
            continue
        groups, depth, cur = [], 0, ""
        for ch in stripped:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = ""
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append(cur)
                    continue
            if depth >= 1:
                cur += ch
        if len(groups) == 1 or (
            len(groups) >= 2
            and (" ASC" in groups[1] or " DESC" in groups[1])
        ):
            n += 1
    return n


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded) — the
    number every scale review starts from."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan))


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastExchange" in physical_plan(df)


def uses_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def broadcast_hint_count(df: DataFrame) -> int:
    """Explicit broadcast HINTS in the analyzed logical plan (not whatever
    AQE later decides). This is the 100 TB-posture check: a hint on a
    fixed-cardinality dim is fine; a hint on a table that grows with the
    fact data forces an OOM at scale no matter what the runtime sizes say."""
    plan = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen stages. Under AQE the codegen markers
    only exist in the FINAL plan, so this executes the query if needed
    (intended for tests at small scale factors)."""
    plan = physical_plan(df)
    if "isFinalPlan=false" in plan:
        df.collect()
        plan = physical_plan(df)
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"\*\((\d+)\) ", plan))
    return len(ids)