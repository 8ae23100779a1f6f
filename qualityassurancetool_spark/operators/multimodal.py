"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode/feature kernels need codec libraries not present in this
container, so the kernels are STUBS behind ``QAT_FAKE_DECODE`` — a
deterministic fake that derives pseudo-features from the byte content —
or raise ``NotImplementedError``.  The Spark-side plumbing (schema,
batching, partition sizing) is real and tested: that is the part that has
to be right at 100 TB (binary columns dominate scan size; feature columns
must be pruned-out of scans that don't need them; decode parallelism is
per-batch, not per-row).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_feature(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: byte-windowed
    means scaled to [0,1).  Replaces (PIL/librosa/ffmpeg)-based extraction."""
    if not content:
        return [0.0] * dim
    step = max(len(content) // dim, 1)
    out = []
    for i in range(dim):
        chunk = content[i * step : (i + 1) * step] or content[-step:]
        out.append(sum(chunk) / (len(chunk) * 255.0))
    return out


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    Real decoding is stubbed: set ``QAT_FAKE_DECODE=1`` (default here) for
    the deterministic fake; otherwise raises ``NotImplementedError`` where a
    production build would call the codec library.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fake = os.environ.get("QAT_FAKE_DECODE", "1") == "1"
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this container; set QAT_FAKE_DECODE=1 for the "
                    "deterministic fake"
                )
            feats = [
                _fake_feature(c if c is not None else b"", dim)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    # column pruning: only the columns the kernel needs cross into Python
    slim = df.select("media_id", "kind", "content")
    return slim.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def _fit_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving fit into a max_dim square (never upscales)."""
    if w <= 0 or h <= 0 or max(w, h) <= max_dim:
        return w, h
    scale = max_dim / float(max(w, h))
    return max(int(w * scale), 1), max(int(h * scale), 1)


def resize_images(df: DataFrame, max_dim: int = 256) -> DataFrame:
    """Arrow-batched image resize: aspect-preserving fit into a
    ``max_dim`` square.  Only image rows are processed, and only
    (media_id, width, height, content) cross into Python — the plumbing
    that matters at 100 TB (binary columns dominate scan bytes, so
    everything else is pruned before the Python boundary; the resized
    table is written back as its own artifact rather than re-joined).

    The pixel kernel is a stub: with ``QAT_FAKE_DECODE=1`` (default) the
    output payload is a deterministic byte subsample proportional to the
    area ratio — same length contract as a real resize (smaller output,
    derived from input bytes) without a codec library; otherwise raises
    ``NotImplementedError`` where a production build would call PIL.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fake = os.environ.get("QAT_FAKE_DECODE", "1") == "1"
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires codec libraries not present in "
                    "this container; set QAT_FAKE_DECODE=1 for the "
                    "deterministic fake"
                )
            out_w, out_h, out_c = [], [], []
            for w, h, c in zip(pdf["width"], pdf["height"], pdf["content"]):
                w = int(w) if pd.notna(w) else 0
                h = int(h) if pd.notna(h) else 0
                nw, nh = _fit_dims(w, h, max_dim)
                c = c if c is not None else b""
                if w > 0 and h > 0 and (nw, nh) != (w, h):
                    # deterministic stand-in: stride-subsample the bytes
                    # by the area ratio (output size shrinks like a real
                    # resize would)
                    stride = max(round((w * h) / float(nw * nh)), 1)
                    c = c[::stride]
                out_w.append(nw)
                out_h.append(nh)
                out_c.append(c)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "content": out_c,
                }
            )

    slim = df.where(F.col("kind") == "image").select(
        "media_id", "width", "height", "content"
    )
    return slim.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media, frame_ts) —
    the decode itself is stubbed, but the fan-out shape (generator-style
    mapInPandas, so a 2-hour video yields 7200 rows without materializing
    them driver-side) is the real scale design."""
    n_frames = F.greatest(
        F.ceil(F.coalesce(F.col("duration_s"), F.lit(0.0)) / every_s), F.lit(1)
    ).cast("int")
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_s)
