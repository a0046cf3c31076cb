"""Multimodal column plumbing — image/audio/video as opaque `binary`
columns with typed metadata (superset scope; BASELINE.json north star).

The Spark-side machinery is REAL and tested: schema contract, Arrow-batch
Pandas UDF signatures, `mapInPandas` partition-iterator plumbing, batch
shaping, and deterministic feature extraction (byte histograms — pure
numpy, no codec needed). The actual pixel/sample decoding is STUBBED:
this container has no image/audio libraries, so `decode_image` raises
NotImplementedError unless a PIL-compatible decoder is importable, and
the deterministic fake (`fake_decode_meta`) stands in for tests.

Scale notes: media blobs ride the same partitioning as any fact table;
mapInPandas streams Arrow batches so a 100 MB image row never requires
collecting a partition; feature extraction is embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("content", T.BinaryType(), True),      # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]), True),
])

FEATURE_DIM = 16  # byte-histogram buckets

_FEATURES_SCHEMA = ("media_id long, kind string, n_bytes long, "
                    "features array<double>")
_FRAMES_SCHEMA = ("media_id long, frame_index int, frame_bytes binary")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents corpus: content = utf-8
    bytes of the text (deterministic stand-in blobs), metadata typed."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes):  # pragma: no cover - env-dependent
    """Decode image bytes to an array. STUB: no codec in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires a PIL-compatible codec, not present "
            "in this environment; use fake_decode_meta for plumbing tests"
        ) from exc
    import io

    from PIL import Image as _I
    return np.asarray(_I.open(io.BytesIO(content)))


def fake_decode_meta(content: bytes) -> dict:
    """Deterministic decode stand-in: derives 'dimensions' from content
    length (a real decoder returns the same dict shape)."""
    n = len(content)
    return {"width": int(n % 640) + 1, "height": int(n % 480) + 1,
            "n_bytes": n}


def byte_histogram(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """L1-normalized histogram of byte values in `dim` buckets — a real,
    deterministic feature vector computable without codecs."""
    if not content:
        return np.zeros(dim)
    arr = np.frombuffer(content, dtype=np.uint8)
    hist = np.bincount(arr // (256 // dim), minlength=dim)[:dim]
    return hist / hist.sum()


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, one feature row
    per media item out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [byte_histogram(b or b"").tolist()
                     for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(b or b"") for b in pdf["content"]],
                "features": feats,
            })

    return media.mapInPandas(op, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_size: int = 64,
                  every_k: int = 4) -> DataFrame:
    """Frame sampling plumbing: treat content as fixed-size frames,
    emit every k-th (what a video sampler does post-decode). One input
    row fans out to many output rows — mapInPandas handles the 1->N
    shape change."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = content or b""
                n_frames = len(content) // frame_size
                for fi in range(0, n_frames, every_k):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(
                        content[fi * frame_size:(fi + 1) * frame_size])
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs,
                                "frame_bytes": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(
        op, schema=_FRAMES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through a mapInPandas stage and
    stamps the target dims into metadata (the real kernel would decode,
    resample, re-encode in place of `_identity`)."""

    def _identity(content: bytes) -> bytes:
        return content

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "content": [_identity(b) for b in pdf["content"]],
                "width": width,
                "height": height,
            })

    return media.mapInPandas(
        op, schema="media_id long, kind string, content binary, "
                   "width int, height int")
