"""Vector math over array<float|double> columns — JVM-side, no UDFs.

Built on ``F.zip_with`` / ``F.aggregate`` higher-order functions so similarity
search stays inside codegen. For the 100 TB path these feed
``operators.similarity`` (brute-force and LSH-bucketed ANN).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(ca, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) with 0.0 for zero-norm vectors (never NULL/NaN)."""
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def normalize(a: Column | str) -> Column:
    """Unit-normalize; pre-normalizing the corpus once turns every cosine
    into a plain dot product — the right trade at scale (one pass, stored)."""
    ca = F.col(a) if isinstance(a, str) else a
    n = l2_norm(ca)
    return F.when(n > 0, F.transform(ca, lambda v: v / n)).otherwise(ca)
