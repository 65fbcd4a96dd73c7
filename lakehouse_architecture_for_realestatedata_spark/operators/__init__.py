"""Relational + extension operators, each a tested composition of DataFrame ops."""

from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
    daily_summary,
    davg,
    dsum,
    quality_report,
)
from lakehouse_architecture_for_realestatedata_spark.operators.asof import (
    asof_join,
    range_join_binned,
)
from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
    dedup_exact,
    dedup_latest,
    dedup_latest_agg,
    embedding_near_dup_pairs,
    fuzzy_pairs_blocked,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from lakehouse_architecture_for_realestatedata_spark.operators.graph import (
    connected_components,
    keep_canonical,
)
from lakehouse_architecture_for_realestatedata_spark.operators.joins import (
    anti_join,
    join_with_default,
    semi_join,
    star_join,
)
from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
    sample_exact_n,
    sample_fraction,
    split_assign,
)
from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
    ivf_assign,
    ivf_knn,
    knn_bruteforce,
    hard_negatives,
    knn_quantized,
)
from lakehouse_architecture_for_realestatedata_spark.operators.skew import salted_join
from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
    daily_measure,
    global_top_k,
    global_row_number,
    grouped_cume_dist,
    grouped_row_number,
    global_running_sum,
    ntile_buckets,
    period_over_period,
    ranked_in_group,
    rolling_frame,
)

__all__ = [
    "daily_summary",
    "davg",
    "dsum",
    "quality_report",
    "asof_join",
    "range_join_binned",
    "dedup_exact",
    "dedup_latest",
    "dedup_latest_agg",
    "embedding_near_dup_pairs",
    "fuzzy_pairs_blocked",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_dedup_pairs",
    "connected_components",
    "keep_canonical",
    "anti_join",
    "join_with_default",
    "semi_join",
    "star_join",
    "sample_exact_n",
    "sample_fraction",
    "split_assign",
    "ivf_assign",
    "ivf_knn",
    "knn_bruteforce",
    "hard_negatives",
    "knn_quantized",
    "salted_join",
    "daily_measure",
    "global_top_k",
    "global_row_number",
    "grouped_cume_dist",
    "grouped_row_number",
    "global_running_sum",
    "ntile_buckets",
    "period_over_period",
    "ranked_in_group",
    "rolling_frame",
]
