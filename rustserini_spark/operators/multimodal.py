"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a typed
metadata struct, processed batch-at-a-time in Arrow (``mapInPandas``). The
actual codec work (JPEG decode, resampling, frame extraction) needs libraries
this container doesn't ship, so the codec kernels SOFT-IMPORT their library
(Pillow for images, PyAV for video) at module load: when present the real
kernel runs; when absent ``use_real_decode=True`` raises a clearly marked
``NotImplementedError`` and the deterministic fakes keep the Spark-side
plumbing — schema, batch shape, UDF signatures, partitioning — real and fully
tested either way. The same tests cover both modes (skip-gated on HAVE_PIL /
HAVE_PYAV).

Design for 100 TB: media bytes never leave the executor (no collect), batches
are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` *rows* but the
real bound at scale is bytes — callers should repartition so
rows_per_partition x avg_media_bytes fits executor memory; feature extraction
is a map-only stage (zero shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


# soft-import codec libraries: real kernels activate automatically on a
# provisioned cluster, deterministic fakes keep this container fully tested
try:  # pragma: no cover - absent in this container
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

try:  # pragma: no cover - absent in this container
    import av as _av

    HAVE_PYAV = True
except ImportError:
    _av = None
    HAVE_PYAV = False


def decode_image(data: bytes) -> "np.ndarray":
    """Image bytes -> HxWxC uint8 array via Pillow when importable; otherwise
    a clearly marked NotImplementedError (this container ships no codecs —
    everything around this kernel is production-shaped either way)."""
    if HAVE_PIL:  # pragma: no cover - exercised only where Pillow exists
        import io

        return np.asarray(_PILImage.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "not available in this environment — use fake_features for plumbing tests"
    )


def fake_features(data: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector: dim floats derived from the
    sha256 of the bytes (stable across partitionings/engines)."""
    h = hashlib.sha256(data).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def pixel_features(arr: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real-decode feature kernel: 4x4 grid of mean gray intensities in [0,1]
    over the decoded pixel array (any HxW or HxWxC uint8 input)."""
    g = arr.mean(axis=2) if arr.ndim == 3 else arr
    h, w = g.shape
    ys = np.linspace(0, h, 5).astype(int)
    xs = np.linspace(0, w, 5).astype(int)
    out = [
        g[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
        for i in range(4)
        for j in range(4)
    ]
    return (np.asarray(out, dtype=np.float32) / np.float32(255.0))[:dim]


def media_metadata_col(media: str, media_type: str = "image"):
    """Typed metadata struct from the binary column (cheap, JVM-side)."""
    c = F.col(media)
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.length(c).cast("long").alias("n_bytes"),
    )


def extract_features(
    media_df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    media_type: str = "image",
    use_real_decode: bool = False,
) -> DataFrame:
    """Map-only Arrow feature extraction: (media_id, media) -> FEATURES_SCHEMA.

    One pass, no shuffle; batches arrive as pandas with bytes objects. With
    ``use_real_decode`` the stubbed decoder raises (by design) until a codec
    library is provisioned.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats, hashes = [], []
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                data = bytes(data) if data is not None else b""
                if use_real_decode:
                    # raises NotImplementedError when no codec lib is present;
                    # empty/undecodable payloads fail with a LABELED error (a
                    # bare PIL UnidentifiedImageError inside the Arrow UDF
                    # would kill the stage without naming the row)
                    if not data:
                        raise ValueError(
                            f"extract_features: empty media bytes for media_id={int(mid)}"
                        )
                    try:
                        feats.append(pixel_features(decode_image(data)).tolist())
                    except NotImplementedError:
                        raise
                    except Exception as e:  # pragma: no cover - codec-lib path
                        raise ValueError(
                            f"extract_features: undecodable media_id={int(mid)}: {e}"
                        ) from e
                else:
                    feats.append(fake_features(data).tolist())
                hashes.append(hashlib.sha256(data).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media_type": media_type,
                    "content_hash": hashes,
                    "features": feats,
                }
            )

    return media_df.select(id_col, media_col).mapInPandas(run, FEATURES_SCHEMA)


def media_exact_dedup(media_df: DataFrame, id_col: str = "media_id", media_col: str = "media") -> DataFrame:
    """Exact binary dedup on content hash — JVM-side sha2, one shuffle."""
    return (
        media_df.groupBy(F.sha2(F.col(media_col), 256).alias("content_hash"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper"))
    )


# ------------------------------------------------------------ resize / frames


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """Image bytes -> resized PNG bytes via Pillow when importable; otherwise
    a clearly marked NotImplementedError (no codecs in this container)."""
    if HAVE_PIL:  # pragma: no cover - exercised only where Pillow exists
        import io

        img = _PILImage.open(io.BytesIO(data)).convert("RGB").resize((width, height))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()
    raise NotImplementedError(
        "image resize requires an imaging library (e.g. Pillow); "
        "not available in this environment — deterministic fake used for plumbing tests"
    )


def _fake_resized(data: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for the resized payload: sha256-keyed bytes of a
    plausible size (w*h//8), stable across partitionings."""
    seed = hashlib.sha256(data + f":{width}x{height}".encode()).digest()
    n = max(1, width * height // 8)
    return (seed * (n // len(seed) + 1))[:n]


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(
    media_df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    media_col: str = "media",
    use_real_decode: bool = False,
) -> DataFrame:
    """Map-only Arrow resize stage: (media_id, media) -> resized payloads.
    Zero shuffle; the codec call is the stub, the batch shape / schema /
    byte-handling contract is the real one a Pillow kernel drops into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for mid, data in zip(pdf[id_col], pdf[media_col]):
                data = bytes(data) if data is not None else b""
                if use_real_decode:
                    # raises NotImplementedError when no codec lib is present;
                    # empty/undecodable payloads fail with a LABELED error
                    if not data:
                        raise ValueError(
                            f"resize_images: empty media bytes for media_id={int(mid)}"
                        )
                    try:
                        out.append(resize_image(data, width, height))
                    except NotImplementedError:
                        raise
                    except Exception as e:  # pragma: no cover - codec-lib path
                        raise ValueError(
                            f"resize_images: undecodable media_id={int(mid)}: {e}"
                        ) from e
                else:
                    out.append(_fake_resized(data, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "media": out,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    return media_df.select(id_col, media_col).mapInPandas(run, RESIZED_SCHEMA)


def frame_offsets_col(duration_col, n_frames: int):
    """Deterministic uniform frame-sample timestamps (ms) from the metadata
    duration — pure Catalyst, the REAL (non-stub) half of video sampling:
    ts_i = floor(i * duration / n) for i in 0..n-1."""
    d = F.col(duration_col) if isinstance(duration_col, str) else duration_col
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.floor(i * d / n_frames).cast("int"),
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def decode_video_frame(data: bytes, ts_ms: int) -> bytes:
    """Video bytes -> the decoded frame nearest ts_ms as PNG bytes via PyAV
    when importable; otherwise a clearly marked NotImplementedError.

    Seeking lands on the keyframe at/before ts_ms, so decoding continues past
    it until the first frame at/after the target; of the two frames straddling
    ts_ms the closer one wins (a bare seek-and-take-first would silently
    return a frame well before the target)."""
    if HAVE_PYAV:  # pragma: no cover - exercised only where PyAV exists
        import io

        def _png(frame) -> bytes:
            buf = io.BytesIO()
            frame.to_image().save(buf, format="PNG")
            return buf.getvalue()

        with _av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            tb = float(stream.time_base)
            target = ts_ms / 1000.0
            container.seek(int(target / tb), stream=stream)
            prev = prev_t = None
            for frame in container.decode(stream):
                t = (frame.pts or 0) * tb
                if t >= target:
                    if prev is not None and (target - prev_t) <= (t - target):
                        return _png(prev)
                    return _png(frame)
                prev, prev_t = frame, t
            if prev is not None:  # target past the last frame
                return _png(prev)
        raise ValueError(f"no decodable frame at {ts_ms}ms")
    raise NotImplementedError(
        "video decoding requires a codec library (e.g. PyAV/ffmpeg); "
        "not available in this environment — deterministic fake used for plumbing tests"
    )


def sample_video_frames(
    media_df: DataFrame,
    n_frames: int,
    id_col: str = "media_id",
    media_col: str = "media",
    duration_col: str = "duration_ms",
    use_real_decode: bool = False,
) -> DataFrame:
    """(media_id, media, duration_ms) -> one row per sampled frame. Frame
    TIMESTAMPS are computed exactly (uniform over the metadata duration); the
    frame pixel decode is the stubbed kernel. Map-only, zero shuffle; output
    fan-out is n_frames rows per video."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, tss, frames = [], [], [], []
            for mid, data, dur in zip(pdf[id_col], pdf[media_col], pdf[duration_col]):
                data = bytes(data) if data is not None else b""
                dur = int(dur) if dur is not None else 0
                for i in range(n_frames):
                    ts = (i * dur) // n_frames
                    if use_real_decode:
                        # raises NotImplementedError when no codec lib exists;
                        # empty payloads fail with a LABELED error
                        if not data:
                            raise ValueError(
                                f"sample_video_frames: empty media bytes for media_id={int(mid)}"
                            )
                        frames.append(decode_video_frame(data, ts))
                    else:
                        frames.append(hashlib.sha256(data + f"@{ts}".encode()).digest())
                    ids.append(int(mid))
                    idxs.append(i)
                    tss.append(ts)
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "ts_ms": np.asarray(tss, dtype=np.int32),
                    "frame": frames,
                }
            )

    return media_df.select(id_col, media_col, duration_col).mapInPandas(run, FRAMES_SCHEMA)
