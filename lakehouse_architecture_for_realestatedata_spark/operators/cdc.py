"""Change-data-capture by snapshot comparison: diff two table states into an
insert/update/delete changelog — the read-side complement of the storage
spine's keyed MERGE upsert (sources/tables.py MERGE; reference
scripts/normalize_bronze_columns.py:145-148 upserts by natural key).

``snapshot_diff(old, new, keys)`` emits one row per changed key:
  - ``insert`` — key present only in ``new``
  - ``delete`` — key present only in ``old``
  - ``update`` — key in both, any compared column differing (NULL-safe)
Unchanged keys are dropped, so output size is proportional to the actual
churn, not the table.

Distributed shape: ONE full-outer sort-merge/hash join on the key columns —
the minimal possible data movement for an unordered diff (both snapshots must
meet on the key). At 100 TB the join is shuffle-on-key; if both snapshots are
written bucketed by the key (plans/layout.py) and the key is a real primary
key (``nullable_keys=False``), the exchange disappears entirely — pinned in
tests/test_scale_ops.py. Column comparison is a packed-struct eqNullSafe —
codegen, no UDF.
The changelog feeds MERGE on a downstream table, giving an end-to-end
snapshot→incremental replication path without a transaction log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str] | None = None,
    nullable_keys: bool = True,
) -> DataFrame:
    """Changelog between two snapshots sharing a schema.

    Output: key columns + ``change_type`` (insert|update|delete) + the NEW
    image of non-key columns (OLD image for deletes, so downstream MERGE
    DELETE clauses still see the full row).

    ``compare`` defaults to every non-key column of ``new``; narrow it to
    ignore volatile columns (audit timestamps etc.).

    ``nullable_keys`` (default True) joins null-safe so NULL key values
    still pair up. When the diff key is a real primary key (never NULL),
    pass False: Catalyst then keeps the RAW key columns as the join keys —
    a null-safe join rewrites them to ``(coalesce(k, 0), isnull(k))``,
    which no longer matches a bucketed table's hash distribution — so two
    snapshots written bucketed by the key diff with ZERO Exchange nodes
    (pinned in tests/test_scale_ops.py).
    """
    non_key = [c for c in new.columns if c not in keys]
    cmp_cols = compare if compare is not None else non_key
    missing = [c for c in cmp_cols if c in keys or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns must be non-key columns of new: {missing}")

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.lit(1).alias("__opresent"),
        F.struct(*[F.col(c) for c in cmp_cols]).alias("__ocmp"),
        F.struct(*[F.col(c) for c in non_key]).alias("__oimg"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        F.lit(1).alias("__npresent"),
        F.struct(*[F.col(c) for c in cmp_cols]).alias("__ncmp"),
        F.struct(*[F.col(c) for c in non_key]).alias("__nimg"),
    )
    cond = None
    for k in keys:
        if nullable_keys:
            c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        else:
            c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")

    # Presence via lit markers, not key-NULL tests: key columns may
    # legitimately hold NULLs (eqNullSafe join above matches them).
    in_old = F.col("__opresent").isNotNull()
    in_new = F.col("__npresent").isNotNull()
    change = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(~F.col("__ocmp").eqNullSafe(F.col("__ncmp")), F.lit("update"))
    )
    img = F.when(in_new, F.col("__nimg")).otherwise(F.col("__oimg"))
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
                for k in keys
            ],
            "change_type",
            *[img[c].alias(c) for c in non_key],
        )
    )
