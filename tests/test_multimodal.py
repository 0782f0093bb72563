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


def test_decode_soft_import_gating():
    """With no codec lib the kernel raises the clearly-marked stub error; with
    Pillow importable the same call decodes real pixels (soft-import)."""
    from rustserini_spark.operators.multimodal import HAVE_PIL

    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff")
    else:  # pragma: no cover - runs only where Pillow is provisioned
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 4), (255, 0, 0)).save(buf, format="PNG")
        arr = decode_image(buf.getvalue())
        assert arr.shape == (4, 4, 3) and arr[0, 0, 0] == 255


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
    """use_real_decode=True raises without a codec lib; with Pillow present
    the SAME pipeline yields real pixel features (no fake fallback)."""
    from rustserini_spark.operators.multimodal import HAVE_PIL

    if not HAVE_PIL:
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        with pytest.raises((PythonException, Py4JJavaError, Exception)):
            extract_features(media, use_real_decode=True).collect()
    else:  # pragma: no cover - runs only where Pillow is provisioned
        out = extract_features(_png_media(spark), use_real_decode=True).collect()
        assert all(len(r.features) == FEATURE_DIM for r in out)


def _png_media(spark):  # pragma: no cover - only used when Pillow exists
    import io

    from PIL import Image

    rows = []
    for i in range(4):
        buf = io.BytesIO()
        Image.new("RGB", (16, 16), (i * 60, 0, 0)).save(buf, format="PNG")
        rows.append((i, buf.getvalue()))
    return spark.createDataFrame(rows, "media_id long, media binary")


def test_metadata_col(spark, media):
    meta = media.select("media_id", media_metadata_col("media").alias("m")).collect()
    by_id = {r.media_id: r.m for r in meta}
    assert by_id[0].n_bytes == 100 and by_id[0].media_type == "image"


def test_media_exact_dedup(spark, media):
    groups = {r.keeper: r.n_dups for r in media_exact_dedup(media).collect()}
    assert groups[3] == 2
    assert sum(groups.values()) == 41


def test_resize_images_plumbing(spark, media):
    from rustserini_spark.operators.multimodal import resize_images

    out = resize_images(media, 32, 16).collect()
    assert len(out) == 41
    by_id = {r.media_id: r for r in out}
    assert by_id[0].width == 32 and by_id[0].height == 16
    assert len(bytes(by_id[0].media)) == 32 * 16 // 8
    # deterministic across partitionings; identical inputs -> identical outputs
    again = {r.media_id: bytes(r.media) for r in resize_images(media.repartition(5), 32, 16).collect()}
    assert all(bytes(by_id[i].media) == again[i] for i in by_id)
    assert again[3] == again[40]  # planted duplicate payloads


def test_resize_real_decode_gated(spark, media):
    from rustserini_spark.operators.multimodal import HAVE_PIL, resize_images

    if not HAVE_PIL:
        with pytest.raises(Exception):
            resize_images(media, 8, 8, use_real_decode=True).collect()
    else:  # pragma: no cover - runs only where Pillow is provisioned
        out = resize_images(_png_media(spark), 8, 8, use_real_decode=True).collect()
        assert all(r.width == 8 and r.height == 8 and len(bytes(r.media)) > 0 for r in out)


def test_pixel_features_kernel():
    """The real-decode feature kernel itself is testable without a codec lib:
    4x4 grid means over a synthetic pixel array."""
    import numpy as np

    from rustserini_spark.operators.multimodal import pixel_features

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    arr[:4, :4] = 255  # top-left quadrant white
    f = pixel_features(arr)
    assert len(f) == FEATURE_DIM
    assert f[0] == pytest.approx(1.0) and f[1] == pytest.approx(1.0)
    assert f[15] == pytest.approx(0.0)


def test_sample_video_frames(spark):
    import pandas as pd
    from rustserini_spark.operators.multimodal import frame_offsets_col, sample_video_frames

    vids = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "media": [b"v1" * 50, b"v2" * 50], "duration_ms": [1000, 40]}
        )
    )
    out = sample_video_frames(vids, n_frames=4).collect()
    assert len(out) == 8
    got = {(r.media_id, r.frame_idx): r.ts_ms for r in out}
    assert [got[(1, i)] for i in range(4)] == [0, 250, 500, 750]
    assert [got[(2, i)] for i in range(4)] == [0, 10, 20, 30]
    # Catalyst offsets expression agrees with the sampled rows
    offs = {
        r.media_id: r.offs
        for r in vids.select("media_id", frame_offsets_col("duration_ms", 4).alias("offs")).collect()
    }
    assert offs[1] == [0, 250, 500, 750] and offs[2] == [0, 10, 20, 30]
    # frames deterministic per (content, ts)
    out2 = {(r.media_id, r.frame_idx): bytes(r.frame) for r in sample_video_frames(vids.repartition(3), n_frames=4).collect()}
    assert all(out2[(r.media_id, r.frame_idx)] == bytes(r.frame) for r in out)
