"""Scalar column-function library.

The reference performs every transformation, including Vietnamese free-text
price/area parsing, with Spark built-in functions (SURVEY §2.8 F1-F20 /
§2.10). Preserving that is a deliberate design choice: built-ins stay inside
whole-stage codegen; a row-at-a-time Python UDF in the parse path would cost
10-100× at 100 TB.

The one sanctioned exception is ``sketches``: seed×element signature kernels
(MinHash/SimHash/hyperplane) whose higher-order-function form evaluates
INTERPRETED per array element (~1000× slower, measured) — those run as
Arrow-batched vectorized numpy ``pandas_udf`` kernels, with the string
hashing still done JVM-side by ``xxhash64``.
"""

from lakehouse_architecture_for_realestatedata_spark.functions.parsing import (
    md5_id,
    norm_text,
    parse_numeric,
    parse_price_vnd,
    quality_flag,
    region_bucket,
    split_address,
    stable_id,
)
from lakehouse_architecture_for_realestatedata_spark.functions.text import (
    char_ngrams,
    doc_fingerprint,
    lang_id,
    quality_score,
    shingles,
    token_count,
    tokens,
)
from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
    batch_cosine,
    hashed_shingles,
    hashed_tokens,
    hyperplane_sketch,
    minhash_buckets,
    minhash_signature,
    packed_hamming,
    simhash64,
)
from lakehouse_architecture_for_realestatedata_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    normalize,
)

__all__ = [
    "md5_id",
    "norm_text",
    "parse_numeric",
    "parse_price_vnd",
    "quality_flag",
    "region_bucket",
    "split_address",
    "stable_id",
    "char_ngrams",
    "doc_fingerprint",
    "lang_id",
    "quality_score",
    "shingles",
    "token_count",
    "tokens",
    "batch_cosine",
    "hashed_shingles",
    "hashed_tokens",
    "hyperplane_sketch",
    "minhash_buckets",
    "minhash_signature",
    "packed_hamming",
    "simhash64",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize",
]
