"""Physical table layout policy — the 100 TB concerns the reference leaves on
the table: no writer in the reference declares partition columns anywhere
(reference: scripts/load_bronze_to_table.py:158-161 and dbt/dbt_project.yml:26-37
set none), so every downstream date-ranged query scans the full table. This
module is the layout layer SURVEY.md §4 flags as the first extension.

Three levers, in the order they pay off at scale:
  1. **Hive partitioning** (``write_partitioned``) on a low-cardinality,
     always-filtered key (date_key, region): partition PRUNING removes whole
     directories at plan time — the scan never lists them.
  2. **Range clustering + in-file sort** (``cluster_by``): within each
     partition, co-locate rows by the secondary filter keys so parquet
     row-group min/max stats skip pages (data skipping). Range partitioning
     also fixes file-count/size (no 100k tiny files, no 10 GB monsters).
  3. **Space-filling-curve interleave** when TWO+ columns are filtered
     independently: lexicographic sort favors the leading column only; a
     curve index gives every column locality in the same file set. Two
     curves, both over rank-encoded columns (``column_range_bounds`` —
     any orderable type, skew-balanced, ANSI-safe): Morton/Z
     (``z_value_ranked``, delta-spark OPTIMIZE ZORDER) and Hilbert
     (``with_hilbert_value``, delta-spark liquid clustering's curve —
     no diagonal jumps, so multi-dim range predicates touch fewer files).

All plain parquet + built-in expressions — the same policy applies unchanged
to Delta/Iceberg writers (their OPTIMIZE ZORDER / liquid clustering is
this, managed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    sort_within: list[str] | None = None,
) -> None:
    """Write hive-partitioned parquet; optionally sort rows within each task
    so parquet min/max stats are tight for ``sort_within`` columns.

    Partition columns must be low-cardinality (days, regions — NOT ids):
    each distinct value is a directory, and 10M directories is its own
    pathology."""
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def _interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave of the low ``bits`` bits of each (already bigint,
    already non-negative) column. Pure scalar bit ops — codegen'd, no UDF,
    no shuffle of its own."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    mask_one = F.lit(1).cast("bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c, b).bitwiseAND(mask_one)
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


_INTEGRAL_DTYPES = ("tinyint", "smallint", "int", "bigint")


def z_value(df: DataFrame, cols: list[Column | str], bits: int = 16) -> Column:
    """Z-order (Morton) value for NON-NEGATIVE INTEGER columns (days since
    epoch, surrogate keys, pre-bucketed ids) — the precondition is now
    CHECKED against ``df``'s schema and violations raise TypeError by name
    (r14; a blind cast here was the r12 driver-red: on a string column it
    NULL-collapses every row into one z-cell under non-ANSI — a single task
    rewrites the whole table with zero data skipping — or throws
    CAST_INVALID_INPUT under ANSI). For arbitrary orderable columns —
    strings, dates, skewed ints — use ``z_value_ranked``, which
    frequency-balance rank-encodes each column first.

    bits × len(cols) must fit in 63; 16 bits × 2 cols (65k distinct each) is
    the standard BI sweet spot."""
    resolved = [F.col(c) if isinstance(c, str) else c for c in cols]
    for field in df.select(*resolved).schema.fields:
        dt = field.dataType.simpleString()
        if dt not in _INTEGRAL_DTYPES:
            raise TypeError(
                f"z_value requires integer-valued columns; {field.name} is "
                f"{dt} — use z_value_ranked, which rank-encodes any "
                "orderable type"
            )
    return _interleave_bits([c.cast("bigint") for c in resolved], bits)


#: dtypes ``column_range_bounds`` accepts — every atomic orderable type.
#: Everything else (array/map/struct/binary/void) is refused BY NAME: a
#: silent cast would either throw under ANSI or NULL-collapse every row
#: into one range partition (one task rewrites the whole table, zero
#: data skipping afterwards).
_ORDERABLE_DTYPES = ("tinyint", "smallint", "int", "bigint", "float",
                     "double", "decimal", "string", "date", "timestamp",
                     "timestamp_ntz", "boolean")


def _check_orderable(df: DataFrame, col_name: str) -> None:
    dtype = dict(df.dtypes).get(col_name)
    if dtype is None:
        raise KeyError(f"no such column: {col_name}")
    base = dtype.split("(")[0]
    if base not in _ORDERABLE_DTYPES:
        raise TypeError(
            f"cannot range-cluster on {col_name}: type {dtype} is not an "
            "orderable atomic type"
        )


def _multi_column_stats(
    df: DataFrame, cols: list[str]
) -> dict[str, tuple[int, int]]:
    """``{col: (non-null count, approx distinct)}`` for every column in ONE
    column-pruned aggregate job — the per-column stats pass of
    ``column_range_bounds``, fused so N cluster columns pay one driver-
    blocking job instead of N (guide §2.4: remove whole passes)."""
    aggs = []
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__n{i}"))
        aggs.append(F.approx_count_distinct(c).alias(f"__d{i}"))
    row = df.agg(*aggs).first()
    return {
        c: (int(row[f"__n{i}"]), int(row[f"__d{i}"]))
        for i, c in enumerate(cols)
    }


def _bounds_from_stats(
    df: DataFrame,
    col_name: str,
    n: int,
    d: int,
    n_buckets: int,
    cap: int,
) -> list:
    """The boundary-collect half of ``column_range_bounds``, given the
    column's precomputed (non-null count, approx distinct) stats.

    The (value, count) rows are collected UNSORTED and ordered driver-side:
    a Spark ``orderBy`` before ``collect`` costs a range-sample job plus a
    sort exchange per column, for a result the driver (which holds the
    whole bounded list anyway) can sort in microseconds. Python's sort on
    the collected values matches Spark's ordering for every
    ``_ORDERABLE_DTYPES`` member (ints/floats/decimals numerically, strings
    by code point ≡ Spark's binary collation on valid UTF-8, dates and
    timestamps as temporal values), so the boundary walk sees the identical
    sequence."""
    if n_buckets <= 1 or not n:
        return []
    src = df.select(col_name).where(F.col(col_name).isNotNull())
    if d <= cap:
        rows = (
            src.groupBy(col_name)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
    else:
        mod = max(1, n // (cap * 8))
        rows = (
            src.where(
                F.pmod(F.xxhash64(F.col(col_name).cast("string")), F.lit(mod))
                == 0
            )
            .groupBy(col_name)
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        if not rows:  # pathological sample miss: single bucket, still correct
            return []
    # NaN-aware key: Spark's orderBy places NaN GREATEST; Python's float
    # comparisons with NaN are all False, which would make the sort order
    # depend on the nondeterministic collect order (ADVICE r14). At most
    # one NaN row exists (Spark groupBy normalizes NaN), so the flag pair
    # never compares NaN against NaN.
    rows.sort(key=lambda r: (r[col_name] != r[col_name], r[col_name]))
    total = sum(r["__n"] for r in rows)
    k = min(n_buckets, len(rows))
    if k <= 1:
        return []
    targets = [total * i / k for i in range(1, k)]
    bounds: list = []
    cum, ti = 0, 0
    for r in rows:
        cum += r["__n"]
        appended = False
        while ti < len(targets) and cum >= targets[ti]:
            ti += 1
            if not appended:  # a heavy value spanning several targets
                bv = r[col_name]
                if not bounds or bounds[-1] != bv:
                    bounds.append(bv)
                appended = True
    return bounds


def column_range_bounds(
    df: DataFrame, col_name: str, n_buckets: int, cap: int = 4096
) -> list:
    """Driver-collected literal boundary values splitting ``col_name`` into
    at most ``n_buckets`` frequency-balanced range buckets — the delta-spark
    OPTIMIZE ZORDER technique (range_partition_id per column) made
    deterministic: partition assignment becomes a pure row function of the
    value against literal boundaries, immune to task retries/re-execution,
    and works for ANY orderable type (no casts — ANSI-safe).

    Cost: one column-pruned stats pass + one bounded collect. Cardinality
    ≤ ``cap`` → exact weighted quantiles over all distinct values; above
    that, a deterministic content-hash sample (~8·cap rows) approximates
    them — the same sampling delta-spark's RangePartitioner does, minus the
    nondeterminism. Returns [] (single bucket) for empty/constant columns.

    Multi-column callers (``rank_encode``) fuse the stats pass across
    columns and run the boundary collects concurrently; this single-column
    surface keeps the original two-job contract."""
    _check_orderable(df, col_name)
    if n_buckets <= 1:
        return []
    n, d = _multi_column_stats(df, [col_name])[col_name]
    return _bounds_from_stats(df, col_name, n, d, n_buckets, cap)


def multi_column_range_bounds(
    df: DataFrame, cols: list[str], n_buckets: int, cap: int = 4096
) -> list[list]:
    """``column_range_bounds`` for several columns with the driver-blocking
    jobs minimized (guide §2.4/§2.6): ONE fused stats aggregate for all
    columns, then the per-column boundary collects submitted CONCURRENTLY
    from a small thread pool — Spark schedules them side by side, so N
    cluster columns cost ~2 job latencies instead of 2·N. Results are
    identical to calling ``column_range_bounds`` per column."""
    for c in cols:
        _check_orderable(df, c)
    if n_buckets <= 1:
        return [[] for _ in cols]
    stats = _multi_column_stats(df, cols)
    if len(cols) == 1:
        c = cols[0]
        return [_bounds_from_stats(df, c, *stats[c], n_buckets, cap)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, len(cols))) as pool:
        futs = [
            pool.submit(_bounds_from_stats, df, c, *stats[c], n_buckets, cap)
            for c in cols
        ]
        return [f.result() for f in futs]


def range_bucket_id(col: Column | str, bounds: list) -> Column:
    """Bucket id of ``col`` against sorted literal ``bounds``: the count of
    boundaries strictly below the value (NULLs → bucket 0, i.e. first).
    A pure row function of literals — retry-immune, no shuffle, no cast."""
    c = F.col(col) if isinstance(col, str) else col
    if not bounds:
        return F.lit(0).cast("bigint")
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.aggregate(
        arr,
        F.lit(0).cast("bigint"),
        lambda acc, b: acc + F.when(c > b, F.lit(1)).otherwise(F.lit(0)),
    )


def rank_encode(
    df: DataFrame, cols: list[str], n_buckets: int = 256
) -> tuple[list[Column], int]:
    """The shared rank-encoding behind BOTH clustering curves: per-column
    frequency-balanced bucket ids (``column_range_bounds`` +
    ``range_bucket_id``), trimmed so ``bits × len(cols) <= 63`` and scaled
    onto a COMMON bit width. Returns ``(rank_columns, bits)`` with every
    rank guaranteed in ``[0, 2^bits)`` — the precondition of both
    ``_interleave_bits`` and ``with_hilbert_value`` (an out-of-range rank
    would silently alias into the low bits and interleave far-apart key
    ranges into the same cells)."""
    if not cols:
        raise ValueError("rank_encode needs at least one cluster column")
    if len(cols) > 63:  # 63 interleave bits ÷ ≥1 bit per column
        raise ValueError(
            f"too many cluster columns ({len(cols)}): each needs at least "
            "one of the 63 interleave bits"
        )
    all_bounds = multi_column_range_bounds(df, cols, n_buckets)
    n = len(cols)
    bits = max(1, max(len(b) for b in all_bounds).bit_length())
    if bits * n > 63:  # trim boundary lists to what 63 bits can interleave
        bits = 63 // n
        limit = (1 << bits) - 1
        all_bounds = [
            # evenly spaced sub-selection; b is sorted-unique and
            # len(b) > limit makes the picked indices strictly increasing
            [b[i * len(b) // limit] for i in range(limit)]
            if len(b) > limit
            else b
            for b in all_bounds
        ]
    full = (1 << bits) - 1
    ranks = []
    for c, b in zip(cols, all_bounds):
        r = range_bucket_id(c, b)
        # scale every column's rank onto the SAME bit width: a 5-value
        # column interleaved raw against a 256-bucket one contributes only
        # low-order bits and loses all file locality — stretching its ranks
        # across [0, 2^bits) makes each dimension's high bits discriminate
        # equally (values stay < 2^53, so the double division is exact)
        if 0 < len(b) < full:
            r = F.floor(r * F.lit(full) / F.lit(len(b))).cast("bigint")
        ranks.append(r)
    return ranks, bits


def z_value_ranked(
    df: DataFrame, cols: list[str], n_buckets: int = 256
) -> Column:
    """Z-order value over ARBITRARY orderable columns: encode each column to
    its frequency-balanced range-bucket rank (``rank_encode``) and
    Morton-interleave the rank bits. This is what delta-spark's OPTIMIZE
    ZORDER does (interleaved range_partition_ids) — rank encoding both
    supports non-numeric keys (the raw-cast path crashes under ANSI on
    strings, reference-shaped priority/province keys) and equalizes skewed
    numeric distributions so every z-cell carries similar row weight."""
    ranks, bits = rank_encode(df, cols, n_buckets)
    return _interleave_bits(ranks, bits)


def with_hilbert_value(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "__h"
) -> DataFrame:
    """Append the HILBERT-curve index of ``cols`` (already non-negative
    integers < 2^bits — rank-encode arbitrary columns first, see
    ``cluster_by``) as ``out_col``. The Hilbert curve is what delta-spark's
    liquid clustering orders by: unlike the Morton/Z curve it never makes
    the long diagonal jumps that put spatially-adjacent cells in far-apart
    files, so multi-dimensional range predicates touch fewer files at the
    same file count.

    Implementation: Skilling's axes→transpose transform ("Programming the
    Hilbert curve", AIP Conf. Proc. 707, 2004 — the standard public
    n-dimensional algorithm) unrolled over bit levels as pure built-in
    column ops (AND/XOR/shift/CASE — codegen'd, no UDF, no shuffle). Each
    unrolled step lands in its OWN projection (withColumns) so the
    expression stays a DAG of named columns instead of an exponentially
    duplicated tree; Catalyst keeps the steps because collapsing would
    duplicate non-cheap expressions. bits × len(cols) must fit in 63."""
    n = len(cols)
    if n < 1:
        raise ValueError("need at least one column")
    if bits * n > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    # Every step below is a parsed SQL string, not a Column-API chain: the
    # unrolled transform touches each axis at each bit level, and the
    # Column form paid hundreds of py4j round trips of pure driver time per
    # call (the simhash_md5_fingerprints lesson). The projection-per-step
    # DAG structure is unchanged — each selectExpr is the same named-column
    # barrier the withColumns chain produced.
    names = [f"__hx{i}" for i in range(n)]
    if set(names + ["__ht"]) & set(df.columns):
        raise ValueError(
            "with_hilbert_value scratch columns (__hx*/__ht) collide with "
            f"input columns {sorted(set(names + ['__ht']) & set(df.columns))}"
        )
    # out_col is REPLACED when it already exists (the old withColumn
    # semantics — ADVICE r14: passing it through would emit a duplicate
    # column name)
    passthrough = [f"`{c}`" for c in df.columns if c != out_col]
    out = df.selectExpr(
        *passthrough,
        *[
            f"CAST(`{c}` AS BIGINT) AS {nm}"
            for nm, c in zip(names, cols)
        ],
    )
    keep = passthrough  # original columns ride along each step

    def step(exprs: dict[str, str]):
        nonlocal out
        carried = [nm for nm in names if nm not in exprs]
        out = out.selectExpr(
            *keep,
            *carried,
            *[f"{e} AS {nm}" for nm, e in exprs.items()],
        )

    # inverse-undo pass: top bit level down to 2
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            cond = f"({names[i]} & {q}) != 0"
            if i == 0:
                step(
                    {
                        names[0]: (
                            f"IF({cond}, {names[0]} ^ {p}, {names[0]})"
                        )
                    }
                )
            else:
                t = f"(({names[0]} ^ {names[i]}) & {p})"
                step(
                    {
                        names[0]: (
                            f"IF({cond}, {names[0]} ^ {p}, {names[0]} ^ {t})"
                        ),
                        names[i]: (
                            f"IF({cond}, {names[i]}, {names[i]} ^ {t})"
                        ),
                    }
                )
        q >>= 1
    # Gray-encode across axes
    for i in range(1, n):
        step({names[i]: f"{names[i]} ^ {names[i - 1]}"})
    t_expr = "CAST(0 AS BIGINT)"
    q = 1 << (bits - 1)
    while q > 1:
        t_expr = (
            f"IF(({names[n - 1]} & {q}) != 0, ({t_expr}) ^ {q - 1}, {t_expr})"
        )
        q >>= 1
    out = out.selectExpr(*keep, *names, f"{t_expr} AS __ht")
    out = out.selectExpr(
        *keep, *[f"{nm} ^ __ht AS {nm}" for nm in names]
    )
    # transpose → integer: level by level, axis 0 most significant
    h = "CAST(0 AS BIGINT)"
    for lvl in range(bits - 1, -1, -1):
        for i in range(n):
            bit = f"(shiftrightunsigned({names[i]}, {lvl}) & 1)"
            h = f"(shiftleft({h}, 1) | {bit})"
    return out.selectExpr(*keep, f"{h} AS {out_col}")


def cluster_by(
    df: DataFrame,
    cols: list[str],
    n_partitions: int | None = None,
    zorder: bool = False,
    bits: int = 16,
    curve: str = "zorder",
) -> DataFrame:
    """Cluster rows for data skipping: range-repartition on the cluster key
    (or its z-value) and sort within each output partition, so every written
    file covers a narrow key range and parquet row-group stats prune reads.

    This is exactly one shuffle — the write-side cost that buys every future
    read (plus, for curve clustering, one column-pruned boundary pass per
    cluster column — the sampling delta-spark's range partitioner also
    pays). ``n_partitions`` controls output file count (size for
    ~128 MB-1 GB per file at scale). ``curve="hilbert"`` clusters by the
    Hilbert index of the rank-encoded columns instead of the Morton
    interleave (``zorder=True``) — delta-spark liquid clustering's curve,
    same cost, better multi-dimensional locality."""
    if curve not in ("zorder", "hilbert"):
        raise ValueError(f"unknown curve {curve!r} (zorder | hilbert)")
    if zorder or curve == "hilbert":
        # rank-encode every column before curve-encoding: works for strings/
        # dates (a raw bigint cast throws under ANSI and NULL-collapses the
        # range shuffle into ONE partition otherwise) and gives skew-balanced
        # cells for numerics. ~4 buckets per output file keeps each file
        # covering a narrow key range without oversizing the literal arrays.
        n_buckets = max(16, min(1 << bits, 4 * (n_partitions or 64)))
        str_cols = [str(c) for c in cols]
        if curve == "hilbert":
            # delta-spark liquid clustering's curve: the SAME rank
            # encoding (shared helper — review r13 caught a hand-rolled
            # copy here that skipped the 63-bit boundary trimming), the
            # Hilbert index instead of Morton — no diagonal
            # discontinuities, so every dimension's range predicates
            # touch fewer files
            ranks, hb = rank_encode(df, str_cols, n_buckets)
            rank_names = [f"__hr_{c}" for c in str_cols]
            out = df.withColumns(dict(zip(rank_names, ranks)))
            out = with_hilbert_value(out, rank_names, bits=hb, out_col="__z")
            out = out.drop(*rank_names)
        else:
            key = z_value_ranked(df, str_cols, n_buckets)
            out = df.withColumn("__z", key)
        parts = [F.col("__z")]
        out = (
            out.repartitionByRange(n_partitions, *parts)
            if n_partitions
            else out.repartitionByRange(*parts)
        )
        return out.sortWithinPartitions("__z").drop("__z")
    parts = [F.col(c) for c in cols]
    out = (
        df.repartitionByRange(n_partitions, *parts)
        if n_partitions
        else df.repartitionByRange(*parts)
    )
    return out.sortWithinPartitions(*cols)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Catalog-registered bucketed table: rows are hash-partitioned into
    ``n_buckets`` files per partition AT WRITE TIME, so a later join or
    aggregation on ``bucket_cols`` between co-bucketed tables needs NO
    exchange — the shuffle was paid once, at write. The lever for a fact
    table joined on the same key by every nightly job. ``sort_cols`` adds
    in-bucket ordering (sort-merge join without the sort)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def partition_stats(
    spark: SparkSession, path: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """Row counts per hive partition (or per file when ``partition_cols`` is
    None) of a written dataset — the skew check: a partition 100× the median
    means the partition key needs salting or a different grain."""
    df = spark.read.parquet(path)
    if partition_cols:
        return df.groupBy(*partition_cols).count()
    return df.groupBy(F.input_file_name().alias("file")).count()
