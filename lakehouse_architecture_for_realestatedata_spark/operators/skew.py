"""Skew-mitigation operators.

AQE's skew-join splitting handles sort-merge joins on materialized shuffle
stats; these are the explicit levers for the cases it doesn't reach:
broadcast-ineligible dimension joins against a hot-key fact, and hot-key
aggregation state.

``salted_join``: the classic replicate-and-salt rewrite. The big side gets a
random salt in [0, n); the small side is replicated n× (one copy per salt);
the join key becomes (key, salt), so one hot key's rows spread over n tasks
instead of one straggler. Cost: small side shuffles n× its size — pick n ≈
the observed skew factor, not 100.

Keep-latest under skew is already covered by ``dedup.dedup_latest_agg``
(max_by partial aggregation: O(1) state per key per task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position_salt(n_salts: int):
    """Salt expression cycling 0..n_salts-1 by row position within each
    partition (monotonically_increasing_id = partition_id·2⁶³⁻³³ + local row
    index; the partition offset is a multiple of 2³³, so the modulus walks
    the local index) — guarantees ≥2 distinct salts for ANY key with ≥2
    rows, including rows with byte-identical content."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("bigint")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``key`` with the hot keys of ``big``
    spread across ``n_salts`` partitions. Result is identical to the plain
    join (salting only changes the physical distribution).

    The salt is ROW-POSITION based (``monotonically_increasing_id() %
    n_salts``), not content based: a content hash degenerates to a single
    salt whenever a hot key's rows carry identical bytes (post-dedup facts,
    denormalized constants, or a big side holding only the key columns) and
    silently re-funnels the hot key into one task. Position salts cycle
    0..n-1 through every partition, so any hot key with ≥2 rows lands on ≥2
    tasks regardless of content. ``rand`` is still avoided: the salt VALUE a
    row gets never changes the join output (the small side carries every
    salt), and Spark marks the id-bearing stage indeterminate, so a
    shuffle-fetch failure rolls the whole stage back instead of mixing old
    and new map output — output rows stay exactly-once either way.

    Only ``inner`` and ``left`` are supported: the small side is replicated
    ``n_salts`` times, so right/full-outer would emit each unmatched
    small-side row once per replica — silently wrong, hence the ValueError.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: the "
            "replicated small side would duplicate unmatched rows under "
            "right/full-outer semantics"
        )
    keys = [key] if isinstance(key, str) else list(key)
    b = big.withColumn("__salt", _position_salt(n_salts))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")
