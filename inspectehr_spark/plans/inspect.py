"""Plan-quality assertions — the 100 TB design checks made executable.

The reference has no optimizer (SURVEY §4); with Spark the optimizer IS the
execution strategy, so we assert the plans we rely on actually materialize:
filters reach the parquet scan (PushedFilters), column pruning reaches the
scan (ReadSchema), small dims broadcast instead of shuffling the fact
table, and nothing degenerates into a cartesian product. tests/test_plans.py
runs these over the live registry queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan node in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings from each scan (column-pruning witness)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in formatted_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (excluding broadcast exchanges) —
    the operator's shuffle budget."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan))


def codegen_stage_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    return len(ids)
