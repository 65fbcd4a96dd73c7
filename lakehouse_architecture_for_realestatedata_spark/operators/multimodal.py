"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

Design for 100 TB multimodal training data:
  - blobs live in a ``binary`` column next to a typed metadata struct —
    one row per asset, co-partitioned with its features so downstream joins
    are narrow;
  - decode / feature-extract / resize / frame-sample run as Arrow-batched
    ``mapInPandas`` operators: Python is unavoidable for codecs, so the
    plumbing keeps it batch-wise (one FFI hop per ~10k rows, not per row);
  - real codecs (PIL/ffmpeg) are NOT in this container: ``decode_image``
    raises NotImplementedError behind an import-try, and a deterministic
    fake decoder exercises the identical schema/batch path so every piece of
    Spark-side plumbing is tested.

Synthetic blob format (deterministic, schema 'MMv1'):
    bytes 0-3   magic b'MMV1'
    bytes 4-7   width  (big-endian uint32)
    bytes 8-11  height (big-endian uint32)
    bytes 12+   payload = repeating xxhash-derived bytes
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"MMV1"

FEATURE_SCHEMA = (
    "asset_id long, media_type string, n_bytes int, width int, height int, "
    "byte_mean double, byte_entropy double, histogram array<int>"
)

FRAME_SCHEMA = "asset_id long, frame_idx int, frame_bytes binary"


def synthesize_blobs(df: DataFrame, id_col: str, seed_col: str) -> DataFrame:
    """Deterministic fake media: header + hash-derived payload, built with
    JVM-side expressions (no Python). Width/height derived from the seed so
    metadata varies. Stands in for a real object-store bytes column."""
    h = F.xxhash64(F.col(seed_col))
    width = (F.pmod(h, F.lit(64)) + 16).cast("int")
    height = (F.pmod(h, F.lit(48)) + 16).cast("int")
    # repeat in hex-string space, unhex once → 256-byte binary payload
    payload = F.unhex(F.repeat(F.lpad(F.hex(F.abs(h)), 16, "0"), 32))
    blob = F.concat(
        F.lit(MAGIC),
        F.unhex(F.lpad(F.hex(width), 8, "0")),
        F.unhex(F.lpad(F.hex(height), 8, "0")),
        payload,
    )
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image/mmv1").alias("media_type"),
        blob.alias("blob"),
        F.struct(width.alias("width"), height.alias("height")).alias("meta"),
    )


def decode_image(blob: bytes):  # pragma: no cover - real-codec path
    """Real decode — requires an image library not present in this
    container. The Spark-side operators below never call this in tests; the
    fake decoder exercises the same interface."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "use fake_decode for the synthetic MMV1 format"
        ) from e
    raise NotImplementedError("plug a real decoder here when PIL is available")


def fake_decode(blob: bytes) -> tuple[int, int, bytes]:
    """Deterministic decoder for the synthetic MMV1 format."""
    if blob[:4] != MAGIC:
        raise ValueError("not an MMV1 blob")
    width, height = struct.unpack(">II", blob[4:12])
    return width, height, blob[12:]


def extract_features(assets: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """Arrow-batched feature extraction over the binary column: size, mean,
    entropy, 16-bucket byte histogram. mapInPandas → one Python worker per
    partition, vectorized numpy inside — the multimodal UDF shape to copy
    for real decoders."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for asset_id, mtype, blob in zip(
                pdf["asset_id"], pdf["media_type"], pdf["blob"]
            ):
                width, height, payload = fake_decode(bytes(blob))
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=16, range=(0, 256))
                p = hist / max(len(arr), 1)
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out.append(
                    (
                        asset_id,
                        mtype,
                        len(blob),
                        width,
                        height,
                        float(arr.mean()) if len(arr) else 0.0,
                        entropy,
                        hist.astype("int32").tolist(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "media_type",
                    "n_bytes",
                    "width",
                    "height",
                    "byte_mean",
                    "byte_entropy",
                    "histogram",
                ],
            )

    return assets.mapInPandas(_features, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """'Video' frame sampling: evenly-spaced fixed-size slices of the payload,
    one output row per frame — the explode-shaped multimodal operator
    (mapInPandas because real frame extraction needs a codec)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, blob in zip(pdf["asset_id"], pdf["blob"]):
                _, _, payload = fake_decode(bytes(blob))
                if not payload:
                    continue
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    start = min(i * step, max(len(payload) - frame_bytes, 0))
                    rows.append((asset_id, i, payload[start : start + frame_bytes]))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_bytes"])

    return assets.mapInPandas(_frames, schema=FRAME_SCHEMA)


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: metadata-only rewrite here (payload untouched) — the real
    pixel transform belongs in the decode path. Keeps the schema contract a
    real implementation must satisfy."""
    return assets.withColumn(
        "meta",
        F.struct(F.lit(width).alias("width"), F.lit(height).alias("height")),
    )
