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
    expression in a single agg), then an explode-of-structs unpivot of the
    one-row result — metadata-scale. Exact multi-column count_distinct
    makes Spark plan an Expand (one shuffled row per column per input row);
    pass ``exact_distinct=False`` to use approx_count_distinct (HLL,
    partial-aggregated, no Expand) when profiling at full corpus scale.

    Column references are backtick-quoted with doubled inner backticks
    (Spark's identifier escape) and every derived alias comes from the
    ordinal, never the name — the previous ``selectExpr(stack(...))``
    broke, or worse spliced fragments, on names containing backticks or
    quotes (ADVICE r6); now any legal parquet column name profiles
    cleanly.
    """

    def ref(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    cols = list(cols or df.columns)
    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(ref(c)).alias(f"__c{i}_nn"),
            nd(ref(c)).alias(f"__c{i}_nd"),
            F.min(ref(c)).cast("string").alias(f"__c{i}_mn"),
            F.max(ref(c)).cast("string").alias(f"__c{i}_mx"),
        ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__c{i}_nn").alias("__nn"),
                F.col(f"__c{i}_nd").alias("n_distinct"),
                F.col(f"__c{i}_mn").alias("min_value"),
                F.col(f"__c{i}_mx").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    long = one.select(one[0].alias("__n"), F.explode(entries).alias("e"))
    return long.select(
        F.col("e.column").alias("column"),
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("e.__nn")).alias("n_null"),
        F.col("e.n_distinct").alias("n_distinct"),
        F.col("e.min_value").alias("min_value"),
        F.col("e.max_value").alias("max_value"),
    )
