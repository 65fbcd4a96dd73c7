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

    The salt is drawn from the row's own bytes (xxhash64 of the key plus a
    uniformly-distributed random column surrogate — ``rand`` is avoided so
    retried tasks recompute the SAME salt and stay exactly-once under
    speculative execution).

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
    # salt from all non-key columns' hash: deterministic per row content,
    # uncorrelated with the key
    non_key = [c for c in big.columns if c not in keys] or keys
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(n_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")
