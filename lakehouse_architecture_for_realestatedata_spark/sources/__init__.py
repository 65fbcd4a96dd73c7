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
from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
    delta_add_constraint,
    delta_delete_where,
    delta_drop_constraint,
    delta_enable_cdf,
    delta_enable_dvs,
    delta_enable_ict,
    delta_history,
    delta_matching_files,
    delta_merge,
    delta_optimize,
    delta_read,
    delta_read_changes,
    delta_txn_version,
    delta_update_where,
    delta_vacuum,
    delta_versions,
    delta_write,
    export_table_to_delta,
    import_delta_to_table,
)
from lakehouse_architecture_for_realestatedata_spark.sources.delta_source import (
    DeltaLiteDataSource,
    register_delta_lite_source,
)

__all__ = [
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "with_file_provenance",
    "TESTDATA_TABLES",
    "ParquetTable",
    "ManifestIngest",
    "DeltaLiteDataSource",
    "register_delta_lite_source",
    "delta_add_constraint",
    "delta_delete_where",
    "delta_drop_constraint",
    "delta_enable_cdf",
    "delta_enable_dvs",
    "delta_enable_ict",
    "delta_history",
    "delta_matching_files",
    "delta_merge",
    "delta_optimize",
    "delta_read",
    "delta_read_changes",
    "delta_txn_version",
    "delta_update_where",
    "delta_vacuum",
    "delta_versions",
    "delta_write",
    "export_table_to_delta",
    "import_delta_to_table",
]
