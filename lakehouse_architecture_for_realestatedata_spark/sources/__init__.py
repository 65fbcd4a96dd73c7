"""Sources & sinks: readers, incremental manifest ingest, parquet-backed tables."""

from lakehouse_architecture_for_realestatedata_spark.sources.readers import (
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    with_file_provenance,
    TESTDATA_TABLES,
)
from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable
from lakehouse_architecture_for_realestatedata_spark.sources.manifest import ManifestIngest

__all__ = [
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "with_file_provenance",
    "TESTDATA_TABLES",
    "ParquetTable",
    "ManifestIngest",
]
