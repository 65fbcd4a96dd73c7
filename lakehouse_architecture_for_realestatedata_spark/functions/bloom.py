"""Bloom-filter membership sketch, built and probed with pure Spark SQL
expressions — no UDFs, no JVM-internal APIs (Spark's own ``bloom_filter_agg``
is an optimizer-internal expression, not a registered function).

The build is one tiny aggregation: element hashes explode to their probe bit
positions, positions group by 64-bit word with ``bit_or`` (map-side combined,
≤ n_bits/64 rows total — metadata-scale), and the collected words become an
``array<bigint>`` carried on a one-row broadcast frame. Probing is codegen
arithmetic: double hashing (xxhash64 pair, odd step) + ``element_at`` +
``shiftleft`` bit test.

Why this exists: the pre-filter pattern. A bloom of the SMALL side's keys
(eval-set n-grams, blocklist ids, probe keys) broadcasts at ~10 bits/element
— 12 MB per 10M elements, an order of magnitude under the raw key set — and
the 100 TB side tests membership in a fully NARROW pass, so only might-match
rows ever reach an explode/join. False positives are then removed by the
exact operator downstream; no false negatives means the composition stays
exact (see operators/dedup.py:decontaminate_ngram_bloom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEED_H1 = 101
_SEED_H2 = 202


def bloom_n_bits(n_items: int, bits_per_item: int = 10) -> int:
    """Word-aligned bit count for ``n_items`` elements (min 2048 bits).
    10 bits/item with 5 probes gives ~1% false positives."""
    return 64 * max(32, -(-(bits_per_item * max(1, n_items)) // 64))


def _positions(elem: Column, n_bits: int, n_probes: int) -> list[Column]:
    """Probe bit positions via double hashing: pos_i = (h1 + i·h2_odd) mod m.
    Both hashes are reduced mod m BEFORE combining, so the arithmetic never
    overflows (ANSI-safe); the step is forced odd, which cycles the whole
    table for the word-aligned (even) m."""
    h1 = F.pmod(F.xxhash64(elem, F.lit(_SEED_H1)), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(elem, F.lit(_SEED_H2)), F.lit(n_bits)).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_probes)]


def bloom_build(
    elems: DataFrame, col: str, n_bits: int, n_probes: int = 5
) -> list[int]:
    """Build the filter over the (hashable) values of ``elems[col]`` and
    return it as a list of ``n_bits/64`` int64 words. One aggregation whose
    shuffle is ≤ n_bits/64 rows regardless of input size (bit_or partials
    combine map-side)."""
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError("n_bits must be a positive multiple of 64")
    c = F.col(col)
    pos = elems.select(
        F.explode(F.array(*_positions(c, n_bits, n_probes))).alias("__p")
    )
    words = (
        pos.select(
            (F.col("__p") / 64).cast("int").alias("__w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.pmod(F.col("__p"), F.lit(64)).cast("int")
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
        .collect()
    )
    out = [0] * (n_bits // 64)
    for r in words:
        out[r["__w"]] = r["__bits"]
    return out


def with_bloom(df: DataFrame, words: list[int], name: str = "__bloom") -> DataFrame:
    """Attach the filter words as a one-row broadcast column ``name`` —
    relation data on the build side of a broadcast, NOT an expression-tree
    array literal repeated at every probe site."""
    one = df.sparkSession.createDataFrame([(words,)], f"`{name}` array<bigint>")
    return df.crossJoin(F.broadcast(one))


def bloom_might_contain(
    bloom: Column, elem: Column, n_bits: int, n_probes: int = 5
) -> Column:
    """True iff every probe bit for ``elem`` is set — guaranteed True for
    every inserted element, ~1% spuriously True at 10 bits/item."""
    cond = None
    for p in _positions(elem, n_bits, n_probes):
        word = F.element_at(bloom, (p / 64).cast("int") + F.lit(1))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else cond & hit
    return cond
