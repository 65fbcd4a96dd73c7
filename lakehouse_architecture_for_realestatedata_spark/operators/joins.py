"""Join operators (SURVEY §2.3 J1-J4) with scale-aware strategy selection.

The reference's star joins are fact→small-dim equi-joins that Spark should
always broadcast (J1/J2); its NOT-IN incremental logic must become anti-join
at scale (J4) because NOT IN with a nullable subquery both has null-trap
semantics and plans as a broadcast-nested-loop in the worst case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def star_join(
    fact: DataFrame,
    dims: list[tuple[DataFrame, Column | str | list[str]]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """J1: fact ⋈ dim ⋈ dim... with explicit broadcast of each dim side.

    AQE would usually discover the broadcast on its own, but hinting is free
    insurance at 100 TB: a mis-estimated dim triggering a sort-merge join on
    the fact table costs a full fact shuffle.
    """
    out = fact
    for dim, on in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=on, how="inner")
    return out


def join_with_default(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: Column,
    dim_key: Column,
    default: str,
) -> DataFrame:
    """J2: NULL-defaulting equi-join — coalesce(fact.key, default) = dim.key,
    so NULL fact keys land on the dim's designated default row
    (reference: dbt/models/marts/fct_properties.sql:93-94)."""
    return fact.join(F.broadcast(dim), F.coalesce(fact_key, F.lit(default)) == dim_key, "inner")


def anti_join(new: DataFrame, existing: DataFrame, on: str | list[str]) -> DataFrame:
    """J4/P8: rows of ``new`` whose key is absent from ``existing`` — the
    scale-correct rewrite of the reference's NOT IN subqueries
    (reference: dbt/models/marts/dim_locations.sql:23-26)."""
    return new.join(existing, on=on, how="left_anti")


def semi_join(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS: keep rows with a match, emit left columns only."""
    return df.join(other, on=on, how="left_semi")


# Skew-salted joins live in operators.skew.salted_join (content-hash salt:
# deterministic under task retry/speculation, unlike a rand()-drawn salt,
# which can re-draw on recompute and double- or zero-join a row).
