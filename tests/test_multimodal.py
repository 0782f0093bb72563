"""Multimodal plumbing: schema, Arrow batch shape, determinism, stub gating."""

import hashlib

import pytest
from pyspark.sql import functions as F

from rustserini_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_features,
    media_exact_dedup,
    media_metadata_col,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 251]) * (100 + i)) for i in range(40)]
    rows.append((40, rows[3][1]))  # exact binary dup of media 3
    return spark.createDataFrame(rows, "media_id long, media binary").persist()


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_fake_features_deterministic():
    a = fake_features(b"hello")
    b = fake_features(b"hello")
    assert a.tolist() == b.tolist() and len(a) == FEATURE_DIM
    assert fake_features(b"other").tolist() != a.tolist()


def test_extract_features_plumbing(spark, media):
    out = extract_features(media).collect()
    assert len(out) == 41
    by_id = {r.media_id: r for r in out}
    data3 = bytes([3]) * 103
    assert by_id[3].content_hash == hashlib.sha256(data3).hexdigest()
    assert by_id[3].features == pytest.approx(fake_features(data3).tolist())
    assert by_id[40].content_hash == by_id[3].content_hash
    assert all(len(r.features) == FEATURE_DIM for r in out)


def test_extract_features_partitioning_independent(spark, media):
    a = {r.media_id: r.content_hash for r in extract_features(media.repartition(1)).collect()}
    b = {r.media_id: r.content_hash for r in extract_features(media.repartition(7)).collect()}
    assert a == b


def test_real_decode_gated(spark, media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, Py4JJavaError, Exception)):
        extract_features(media, use_real_decode=True).collect()


def test_metadata_col(spark, media):
    meta = media.select("media_id", media_metadata_col("media").alias("m")).collect()
    by_id = {r.media_id: r.m for r in meta}
    assert by_id[0].n_bytes == 100 and by_id[0].media_type == "image"


def test_media_exact_dedup(spark, media):
    groups = {r.keeper: r.n_dups for r in media_exact_dedup(media).collect()}
    assert groups[3] == 2
    assert sum(groups.values()) == 41
