"""Plan inspection: programmatic access to the physical plan, used by tests
to pin the *scale* properties of each operator — filters reach the parquet
scan, dims broadcast, dedup costs exactly one shuffle, codegen spans the hot
path. A correctness-green query with the wrong plan shape is a 100 TB
regression waiting for data; these helpers make plan shape a test assertion.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    """Plan AFTER execution — includes AQE's final choices (a broadcast that
    AQE discovered at runtime shows up here, not in the static plan). The
    action must run on THIS Dataset's QueryExecution (a writer would build
    its own), so we pay a collect()."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning witness."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def count_shuffles(df: DataFrame) -> int:
    """Exchange operators in the static physical plan (AQE may coalesce them
    at runtime but cannot remove a required repartitioning)."""
    plan = physical_plan(df, mode="simple")
    return plan.count("Exchange")


def join_strategies(df: DataFrame) -> list[str]:
    plan = physical_plan(df, mode="simple")
    out = []
    for name in (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        out += [name] * plan.count(name)
    return out


def has_wholestage_codegen(df: DataFrame) -> bool:
    # Under AQE, codegen stages exist only in the finalized (executed) plan —
    # the static explain reports 0 subtrees. In executedPlan().toString(),
    # codegen'd operators carry the `*(stageId)` prefix.
    plan = executed_plan(df)
    return re.search(r"\*\(\d+\)", plan) is not None
