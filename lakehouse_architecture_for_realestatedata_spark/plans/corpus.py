"""End-to-end training-corpus preparation: the pipeline an LLM data team
actually runs, composed from this engine's individually-tested operators.

    raw documents
      → annotate   (quality score, language id, token counts — one narrow
                    codegen pass, no shuffle)
      → gate       (quality / language / length filters — still narrow)
      → exact dedup (fingerprint groupBy, keep min id — one shuffle)
      → near dedup  (MinHash-LSH pairs → connected components → keep the
                     canonical member per cluster)
      → split      (deterministic md5-keyed train/val/test assignment —
                    narrow, partition-invariant)

Two entry points:
  - ``corpus_funnel``: every input row labeled with its fate
    (``kept`` / ``low_quality`` / ``wrong_lang`` / ``too_short`` /
    ``exact_dup`` / ``near_dup``) — the observability view; funnel counts
    are one groupBy away.
  - ``prepare_corpus``: the kept rows with their split assignment — the
    production output.

100 TB shape: stages 1-2 and 5 are narrow (no shuffle); exact dedup is one
hash shuffle on the fingerprint; near-dup is the bucketed LSH pipeline
(never all-pairs) over only the docs that survived the gates. Rejected rows
never reach the expensive stages.

Reference parity note: the reference's pipeline stops at quality flags +
keyed dedup (scripts/normalize_bronze_columns.py, dbt staging); this module
is the training-data superset the survey's north star prescribes.
"""

from __future__ import annotations

from collections.abc import Mapping
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from lakehouse_architecture_for_realestatedata_spark.operators.dedup import minhash_lsh_pairs
from lakehouse_architecture_for_realestatedata_spark.operators.graph import (
    connected_components,
    truncate_lineage,
)
from lakehouse_architecture_for_realestatedata_spark.operators.sampling import split_assign


@dataclass(frozen=True)
class CorpusPrepConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    min_quality: float = 0.3
    langs: tuple[str, ...] | None = None  # keep-list; None = keep all
    min_tokens: int = 1
    near_dup: bool = True
    jaccard_threshold: float = 0.6
    shingle_k: int = 3
    split_weights: Mapping[str, float] = field(
        default_factory=lambda: {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    split_salt: str = "corpus-v1"


def annotate(df: DataFrame, cfg: CorpusPrepConfig) -> DataFrame:
    """Add ``quality`` / ``lang`` / ``n_tokens`` columns — one narrow pass."""
    t = F.col(cfg.text_col)
    return df.withColumns(
        {
            "quality": quality_score(t),
            "lang": lang_id(t),
            "n_tokens": token_count(t),
        }
    )


def corpus_funnel(df: DataFrame, cfg: CorpusPrepConfig | None = None) -> DataFrame:
    """Label every row with its pipeline fate in a ``status`` column.

    Statuses are assigned in gate order (a low-quality doc that is also a
    duplicate reports ``low_quality``: it never reached the dedup stage),
    and the expensive dedup stages only see gate survivors.
    """
    cfg = cfg or CorpusPrepConfig()
    idc, txt = cfg.id_col, cfg.text_col
    ann = annotate(df, cfg)

    gate = F.when(F.col("quality") < cfg.min_quality, F.lit("low_quality"))
    if cfg.langs is not None:
        gate = gate.when(~F.col("lang").isin(list(cfg.langs)), F.lit("wrong_lang"))
    gate = gate.when(F.col("n_tokens") < cfg.min_tokens, F.lit("too_short"))
    gated = ann.withColumn("__gate", gate)

    survivors = gated.filter(F.col("__gate").isNull())

    # exact dedup: identical fingerprint → keep the minimum id. The rank
    # filter plans with a k-bounded WindowGroupLimit partial (top-1 per
    # fingerprint crosses the shuffle, not every duplicate).
    w = Window.partitionBy("__fp").orderBy(F.col(idc))
    fp = survivors.withColumn("__fp", doc_fingerprint(F.col(txt)))
    # slim id list consumed twice (near-dup input trim + status join):
    # truncate lineage so the fingerprint shuffle runs once, like the LSH
    # candidate cache inside minhash_lsh_pairs
    exact_losers = truncate_lineage(
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col(idc).alias("__loser"))
    )

    after_exact = survivors.join(
        exact_losers, survivors[idc] == exact_losers["__loser"], "left_anti"
    )
    if cfg.near_dup:
        pairs = minhash_lsh_pairs(
            after_exact, idc, txt, k=cfg.shingle_k, threshold=cfg.jaccard_threshold
        )
        cc = connected_components(pairs)
        near_losers = cc.filter(F.col("node") != F.col("label")).select(
            F.col("node").alias("__loser")
        )
    else:
        near_losers = None

    out = gated.join(
        exact_losers.withColumn("__exact", F.lit(True)),
        gated[idc] == exact_losers["__loser"],
        "left",
    ).drop("__loser")
    if near_losers is not None:
        out = out.join(
            near_losers.withColumn("__near", F.lit(True)),
            out[idc] == near_losers["__loser"],
            "left",
        ).drop("__loser")
    else:
        out = out.withColumn("__near", F.lit(None).cast("boolean"))

    status = (
        F.when(F.col("__gate").isNotNull(), F.col("__gate"))
        .when(F.col("__exact"), F.lit("exact_dup"))
        .when(F.col("__near"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return out.withColumn("status", status).drop("__gate", "__exact", "__near")


def funnel_report(df: DataFrame, cfg: CorpusPrepConfig | None = None) -> DataFrame:
    """(status, n_docs) — the pipeline's funnel counts, one aggregate."""
    return (
        corpus_funnel(df, cfg)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def prepare_corpus(df: DataFrame, cfg: CorpusPrepConfig | None = None) -> DataFrame:
    """The production output: kept rows (+ annotation columns) with a
    deterministic ``split`` assignment."""
    cfg = cfg or CorpusPrepConfig()
    kept = corpus_funnel(df, cfg).filter(F.col("status") == "kept").drop("status")
    return split_assign(
        kept, cfg.id_col, dict(cfg.split_weights), salt=cfg.split_salt
    )


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key: str,
    salt: str = "shard-v1",
    mode: str = "overwrite",
) -> None:
    """Write the training mix as ``n_shards`` parquet shards in a
    deterministic pseudo-random order — the last-mile step before a data
    loader consumes the corpus.

    Trainers need (a) a global shuffle so consecutive rows aren't correlated
    (a corpus sorted by source/time trains badly), and (b) reproducibility —
    re-running the export must produce byte-stable shard membership and row
    order. ``rand()`` gives neither. Here both come from the content hash:
    shard = hash-partition of the salted content hash (one exchange), row
    order within a shard = sort by (hash, key) (sortWithinPartitions — a
    per-shard sort, never a global one). Changing ``salt`` redraws the
    shuffle.
    """
    h = F.xxhash64(F.concat(F.lit(salt), F.col(key).cast("string")))
    (
        df.withColumn("__h", h)
        .repartition(n_shards, F.col("__h"))
        .sortWithinPartitions("__h", key)
        .drop("__h")
        .write.mode(mode)
        .parquet(path)
    )
