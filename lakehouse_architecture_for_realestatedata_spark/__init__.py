"""lakehouse_architecture_for_realestatedata_spark — a PySpark-native lakehouse analytics engine.

A brand-new implementation (not a port) of the query and data-processing
capabilities of the reference lakehouse (a Medallion bronze→silver→gold
pipeline for real-estate listings: ingest, dedup, merge, parse, star-schema,
aggregate, window, quality-report), generalized into a reusable Spark-first
library, plus large-scale training-data-pipeline operators (deduplication,
similarity search, multimodal columns, text analysis).

Everything is expressed with the DataFrame / Spark SQL API so Catalyst +
Tungsten own the physical plan: predicate pushdown, column pruning,
broadcast-vs-shuffle join selection, whole-stage codegen, AQE.

Layout:
    session     — SparkSession factory tuned for local testing / cluster scale
    sources     — readers (parquet/csv/json), manifest-incremental ingest,
                  parquet-backed tables with MERGE/append/overwrite semantics
    functions   — scalar column function library (parsing, text, vectors,
                  vectorized sketch kernels)
    operators   — relational + extension operators (dedup, joins, windows,
                  aggregates, similarity search, as-of/range joins, skew
                  salting, connected components, multimodal)
    plans       — medallion pipeline assembly, dbt-style checks, plan
                  inspection, physical layout policy (partitioning/z-order/
                  bucketing)
    streaming   — Structured Streaming ingest, windowed/stateful aggregation
"""

from lakehouse_architecture_for_realestatedata_spark.session import get_spark, stop_spark


def serve(warehouse_root: str, spark=None, app_name: str = "lakehouse_architecture_for_realestatedata-serve"):
    """One-call SQL serving bootstrap — see ``sources.catalog.serve``.
    (Lazy import so ``import lakehouse_architecture_for_realestatedata_spark`` stays cheap.)"""
    from lakehouse_architecture_for_realestatedata_spark.sources.catalog import serve as _serve

    return _serve(warehouse_root, spark=spark, app_name=app_name)


__version__ = "0.1.0"

def serve_http(cat, host: str = "127.0.0.1", port: int = 0, max_rows: int = 10_000):
    """Multi-client SQL-over-HTTP front door — see ``sources.catalog.serve_http``."""
    from lakehouse_architecture_for_realestatedata_spark.sources.catalog import serve_http as _sh

    return _sh(cat, host=host, port=port, max_rows=max_rows)


__all__ = ["get_spark", "stop_spark", "serve", "serve_http", "__version__"]
