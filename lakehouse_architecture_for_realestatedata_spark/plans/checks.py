"""Declarative data-quality checks — the engine-native form of the
reference's dbt schema tests (SURVEY §5: unique / not_null / accepted_values
compiled to violation-counting SQL, run as a pipeline stage).

Each check returns a violation DataFrame (empty = pass); ``run_checks``
evaluates a suite in ONE job where possible and returns a report DataFrame
shaped like the reference's dbt-test output.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expect_unique(df: DataFrame, cols: str | list[str]) -> DataFrame:
    """Violations of a uniqueness constraint: key rows with count > 1
    (dbt `unique` — reference: dbt/models/staging/schema.yml:8-10)."""
    keys = [cols] if isinstance(cols, str) else list(cols)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    """dbt `not_null` (reference: dbt/models/marts/schema.yml:86-88)."""
    return df.filter(F.col(col).isNull())


def expect_accepted_values(df: DataFrame, col: str, values: list[str]) -> DataFrame:
    """dbt `accepted_values` (reference: dbt/models/staging/schema.yml:47-51).
    NULLs pass (dbt semantics: accepted_values ignores NULLs)."""
    return df.filter(~F.col(col).isin(values) & F.col(col).isNotNull())


@dataclass(frozen=True)
class Check:
    name: str
    kind: str  # unique | not_null | accepted_values
    column: str | list[str]
    values: tuple[str, ...] = ()


def run_checks(df: DataFrame, checks: list[Check]) -> list[dict]:
    """Evaluate a suite; returns [{'name', 'kind', 'violations', 'passed'}].

    not_null/accepted_values checks are fused into a single aggregate pass
    (one scan); unique checks each need their own groupBy."""
    report: list[dict] = []
    fused_aggs = []
    fused_meta = []
    for c in checks:
        if c.kind == "not_null":
            fused_aggs.append(
                F.sum(F.when(F.col(c.column).isNull(), 1).otherwise(0)).alias(c.name)
            )
            fused_meta.append(c)
        elif c.kind == "accepted_values":
            fused_aggs.append(
                F.sum(
                    F.when(
                        ~F.col(c.column).isin(list(c.values)) & F.col(c.column).isNotNull(),
                        1,
                    ).otherwise(0)
                ).alias(c.name)
            )
            fused_meta.append(c)
    if fused_aggs:
        row = df.agg(*fused_aggs).collect()[0]
        for c in fused_meta:
            n = int(row[c.name] or 0)
            report.append(
                {"name": c.name, "kind": c.kind, "violations": n, "passed": n == 0}
            )
    for c in checks:
        if c.kind == "unique":
            n = expect_unique(df, c.column).count()
            report.append(
                {"name": c.name, "kind": c.kind, "violations": n, "passed": n == 0}
            )
    return report


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, exact_distinct: bool = True
) -> DataFrame:
    """One-pass column profiling report — the discovery half of data
    quality (dbt's `dbt-profiler` / Deequ's ColumnProfilerRunner shape):
    per column ``(column, n_rows, n_null, n_distinct, min_value,
    max_value)``, min/max rendered as strings so heterogeneous column
    types share one report schema.

    Scale shape: ONE aggregation pass (every per-column statistic is an
    expression in a single agg), then a ``stack`` unpivot of the one-row
    result — metadata-scale. Exact multi-column count_distinct makes
    Spark plan an Expand (one shuffled row per column per input row);
    pass ``exact_distinct=False`` to use approx_count_distinct (HLL,
    partial-aggregated, no Expand) when profiling at full corpus scale.
    """
    cols = list(cols or df.columns)
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            nd(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__min`, `{c}__max`" for c in cols
    )
    long = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {pairs}) AS (column, __nn, n_distinct, min_value, max_value)",
    )
    return long.select(
        F.col("column"),
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_null"),
        "n_distinct",
        "min_value",
        "max_value",
    )
