"""Readers: parquet / CSV / JSON scans with scale-aware defaults.

Covers SURVEY §2.1 S1-S5:
  - S1 JSONL scan. The reference reads each JSON batch twice — once to infer
    the schema, once with it pinned (reference: scripts/load_bronze_to_table.py:130-133).
    ``read_json`` fixes the double scan: pass an explicit schema, or let it
    infer from a bounded sample and reuse the inferred schema thereafter.
  - S2 CSV scan with header (reference: scripts/normalize_csv.py:45-48).
  - S3 parquet table scan by path.
  - S5 file-provenance columns: input file path + modification time
    (reference: scripts/load_bronze_to_table.py:134,139-142).

At 100 TB the scan is the single most important operator: everything here
stays in the DataFrame API so Catalyst pushes filters and prunes columns into
the parquet reader (verify with ``plans.explain.scan_info``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# The driver-generated synthetic tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan: pushdown + pruning come free from Catalyst."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (S2). inferSchema only when no schema is given — at scale an
    explicit schema avoids the extra inference pass over the data."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sample_ratio: float = 1.0,
    **options: str,
) -> DataFrame:
    """JSONL scan (S1) without the reference's infer-then-reread double pass.

    With ``schema`` given: single schema-pinned scan. Without: one inference
    pass bounded by ``samplingRatio`` then the normal scan — on a 100 TB drop
    you would pass the persisted schema from the previous run instead.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("samplingRatio", str(sample_ratio))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def with_file_provenance(df: DataFrame) -> DataFrame:
    """S5: attach `_input_file` + `_file_mtime` from the hidden metadata struct
    (reference: scripts/load_bronze_to_table.py:134,139-142 uses
    input_file_name() + _metadata.file_modification_time)."""
    return df.withColumn("_input_file", F.col("_metadata.file_path")).withColumn(
        "_file_mtime", F.col("_metadata.file_modification_time")
    )


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver's synthetic tables and (optionally) register each as a
    temp view so both front doors — DataFrame chains and ``spark.sql`` —
    see the same catalog (SURVEY §3.3: one Catalyst pipeline, two doors)."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
