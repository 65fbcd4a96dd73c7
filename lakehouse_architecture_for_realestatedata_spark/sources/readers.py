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


#: dtypes whose MIN/MAX Spark's V2 parquet scan serves from footer stats
#: (probed on Spark 4.1: integers, float/double, date, boolean push;
#: string/binary, timestamp, decimal do NOT — Spark excludes them for
#: truncated-stats / physical-encoding reasons).
_FOOTER_PUSHABLE = ("tinyint", "smallint", "int", "bigint", "float",
                    "double", "date", "boolean")


def footer_profile(
    spark: SparkSession,
    path: str,
    cols: list[str],
    require_pushdown: bool = False,
) -> DataFrame:
    """Metadata-scale table profile: one row of ``n_rows`` + ``min_<c>`` /
    ``max_<c>`` per requested column, computed so the V2 parquet scan
    serves every aggregate from FOOTER STATS (``PushedAggregation:
    [COUNT(*), MIN(..), MAX(..)]``) — the scan reads row-group metadata,
    never data pages. At 100 TB this is the difference between a
    seconds-long profiling pass and a full-table scan; it is how a
    lakehouse answers "how many rows / what key range landed today"
    before deciding anything heavier.

    Only stats-pushable column types are accepted (refused BY NAME
    otherwise — a silent fallback would quietly run the full scan this
    function exists to avoid; string/timestamp/decimal min-max need the
    ordinary aggregate path). Executes EAGERLY inside a saved/restored
    conf window (aggregatePushdown + the V2 source routing are session
    confs, and the pushdown decision happens at planning — returning a
    lazy frame would plan after the restore and silently lose the
    pushdown). Returns a 1-row local DataFrame.

    ``require_pushdown=True`` raises if the planned scan does not carry
    the pushed aggregation — the guard tests (and 100 TB callers) use to
    keep this metadata-scale, not a hope.
    """
    probe = spark.read.parquet(path)
    dtypes = dict(probe.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise KeyError(f"no such column(s): {missing}")
    bad = [c for c in cols if dtypes[c].split("(")[0] not in _FOOTER_PUSHABLE]
    if bad:
        raise TypeError(
            "footer_profile serves min/max from parquet footer stats; "
            f"type(s) not stats-pushable: "
            f"{ {c: dtypes[c] for c in bad} } — profile these through an "
            "ordinary aggregate instead"
        )
    confs = {
        "spark.sql.parquet.aggregatePushdown": "true",
        "spark.sql.sources.useV1SourceList": "",
    }
    prev: dict[str, str | None] = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k, None)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        agg = spark.read.parquet(path).agg(*aggs)
        if require_pushdown:
            plan = agg._jdf.queryExecution().executedPlan().toString()
            if "PushedAggregation: [COUNT" not in plan:
                raise RuntimeError(
                    "footer_profile scan did not push its aggregation — "
                    "check the parquet layout / Spark version (plan head: "
                    f"{plan.splitlines()[0][:120]})"
                )
        row = agg.first()
        schema = agg.schema
    finally:
        for k, p in prev.items():
            if p is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, p)
    return spark.createDataFrame([row], schema)
