"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lakehouse_architecture_for_realestatedata_spark.queries`` — a registry of
(Spark callable, DuckDB oracle) pairs, one per operator from SURVEY.md §2
plus the training-data-pipeline extension operators.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from lakehouse_architecture_for_realestatedata_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (driver checks rows>0):
    dedup-keep-latest over events feeding a grouped daily summary — the
    reference's normalize→summarize spine end-to-end (SURVEY §7.2 M1)."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import daily_summary
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import dedup_latest

    from lakehouse_architecture_for_realestatedata_spark.queries import _events, pin_contract_confs

    pin_contract_confs(spark)

    events = _events(spark, "/root/testdata/sf0.001")
    latest = dedup_latest(events, "user_id", [F.col("ts").desc(), F.col("event_id").desc()])
    return daily_summary(latest, "ts", "user_id", "value")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark_fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }
