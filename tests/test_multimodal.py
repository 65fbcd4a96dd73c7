"""Multimodal plumbing tests: synthetic blobs, Arrow-batched feature
extraction, frame sampling — the decode stub contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_decode,
    resize_stub,
    sample_frames,
    synthesize_blobs,
)


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    df = synthesize_blobs(docs, "doc_id", "text")
    df.cache().count()
    return df


def test_blob_format_roundtrip(assets):
    row = assets.first()
    width, height, payload = fake_decode(bytes(row["blob"]))
    assert width == row["meta"]["width"] and height == row["meta"]["height"]
    assert len(payload) == 256
    assert 16 <= width < 80 and 16 <= height < 64


def test_extract_features_deterministic_and_correct(assets):
    feats = extract_features(assets).collect()
    assert len(feats) == assets.count()
    by_id = {r["asset_id"]: r for r in feats}
    # independently recompute one row in pure python
    row = assets.first()
    _, _, payload = fake_decode(bytes(row["blob"]))
    arr = list(payload)
    want_mean = sum(arr) / len(arr)
    got = by_id[row["asset_id"]]
    assert abs(got["byte_mean"] - want_mean) < 1e-9
    assert sum(got["histogram"]) == len(arr)
    assert got["n_bytes"] == len(bytes(row["blob"]))
    assert 0 <= got["byte_entropy"] <= math.log2(16) + 1e-9
    # rerun → identical (deterministic plumbing)
    again = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert {k: tuple(v) for k, v in by_id.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_sample_frames_shape(assets):
    frames = sample_frames(assets, n_frames=4, frame_bytes=16)
    rows = frames.collect()
    assert len(rows) == assets.count() * 4
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r)
        assert len(bytes(r["frame_bytes"])) == 16
    for rs in per_asset.values():
        assert sorted(r["frame_idx"] for r in rs) == [0, 1, 2, 3]


def test_resize_stub_rewrites_meta(assets):
    out = resize_stub(assets, 224, 224).first()
    assert out["meta"]["width"] == 224 and out["meta"]["height"] == 224


def test_real_decode_is_gated(assets):
    with pytest.raises(NotImplementedError):
        decode_image(bytes(assets.first()["blob"]))
