"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Kernel selection is INJECTABLE (``decoder=`` on each operator):

- ``"fake"`` — deterministic byte-derived pseudo-features/subsampling;
  hermetic, used by every test and oracle in this repo;
- ``"pil"`` — real image decoding through Pillow when the executor image
  ships it (import-gated; a pointed ``NotImplementedError`` otherwise);
- ``"auto"`` — ``"pil"`` if importable else ``"fake"``.

The default honors ``QAT_FAKE_DECODE`` (default fake) so hermetic runs
stay byte-identical.  The Spark-side plumbing (schema, batching,
partition sizing) is identical across kernels: that is the part that has
to be right at 100 TB (binary columns dominate scan size; feature columns
must be pruned-out of scans that don't need them; decode parallelism is
per-batch, not per-row).  Video codecs (ffmpeg) are a process dependency,
not a Python import — ``frame_sample_plan`` stays plan-only with the
decode seam documented.
"""

from __future__ import annotations

import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _resolve_decoder(decoder: str | None, purpose: str) -> str:
    """→ "fake" | "pil" | "png".  Resolution happens executor-side per
    batch so a heterogeneous cluster image fails loudly, not silently.
    ``auto`` prefers Pillow (all codecs) and falls back to the vendored
    pure-stdlib codecs (``functions/png`` + baseline JPEG in
    ``functions/jpeg``) — real decode with a per-item fake fallback for
    other payloads, so hermetic containers still exercise real
    pixels."""
    if decoder is None:
        decoder = (
            "fake" if os.environ.get("QAT_FAKE_DECODE", "1") == "1" else "auto"
        )
    if decoder == "auto":
        try:
            import PIL  # noqa: F401

            return "pil"
        except ImportError:
            return "png"
    if decoder == "png":
        return "png"
    if decoder == "pil":
        try:
            import PIL  # noqa: F401

            return "pil"
        except ImportError:
            raise NotImplementedError(
                f"{purpose} with decoder='pil' needs Pillow, which this "
                "image does not ship; install Pillow or use "
                "decoder='fake'/'auto'"
            ) from None
    if decoder == "fake":
        return "fake"
    raise ValueError(f"unknown decoder {decoder!r} (fake|pil|png|auto)")

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


def _pil_feature(content: bytes, kind: str, dim: int) -> list[float]:
    """Real image feature: grayscale thumbnail of ``dim`` pixels (one row),
    normalized to [0,1).  Non-image kinds and undecodable payloads fall
    back to the byte-derived fake so one bad file never kills a batch."""
    if kind != "image" or not content:
        return _fake_feature(content or b"", dim)
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(content)).convert("L").resize((dim, 1))
        return [px / 255.0 for px in img.getdata()]
    except Exception:
        return _fake_feature(content, dim)


def extract_features(
    df: DataFrame, dim: int = 8, decoder: str | None = None
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column; kernel
    selected by ``decoder`` (module docstring) — default honors
    ``QAT_FAKE_DECODE`` (fake, hermetic)."""

    if decoder not in (None, "fake", "pil", "png", "auto"):
        raise ValueError(f"unknown decoder {decoder!r} (fake|pil|png|auto)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mode = _resolve_decoder(decoder, "media feature extraction")
        for pdf in batches:
            if mode == "pil":
                feats = [
                    _pil_feature(c, k, dim)
                    for c, k in zip(pdf["content"], pdf["kind"])
                ]
            elif mode == "png":
                feats = [
                    _png_feature(c, k, dim)
                    for c, k in zip(pdf["content"], pdf["kind"])
                ]
            else:
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


def _vendored_decode(content: bytes) -> tuple[int, int, int, bytearray]:
    """Sniff + decode via the vendored codecs: PNG (``functions/png``)
    or baseline JPEG (``functions/jpeg`` — round 9; crawl corpora are
    JPEG-dominated).  Raises on anything else; callers fall back
    per-item."""
    if content.startswith(b"\xff\xd8"):
        from qualityassurancetool_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(content)
    from qualityassurancetool_spark.functions.png import decode_png

    return decode_png(content)


def _png_feature(content: bytes, kind: str, dim: int) -> list[float]:
    """Real image feature via the vendored codecs (PNG + baseline
    JPEG): luma box-thumbnail of ``dim`` pixels (one row), normalized
    to [0,1).  Non-image kinds and exotic payloads fall back to the
    byte-derived fake — the same per-item contract as the Pillow
    kernel."""
    if kind != "image" or not content:
        return _fake_feature(content or b"", dim)
    try:
        from qualityassurancetool_spark.functions.png import (
            box_resize,
            to_gray,
        )

        w, h, ch, px = _vendored_decode(content)
        gray = to_gray(w, h, ch, px)
        row = box_resize(gray, w, h, 1, dim, 1)
        return [p / 255.0 for p in row]
    except Exception:
        return _fake_feature(content, dim)


def _png_resize(content: bytes, nw: int, nh: int) -> bytes | None:
    """Real resize via the vendored codecs (PNG or baseline JPEG in,
    box filter, re-encoded PNG out — the same output container as the
    Pillow kernel); undecodable → None content (recorded, not fatal)."""
    try:
        from qualityassurancetool_spark.functions.png import (
            box_resize,
            encode_png,
        )

        w, h, ch, px = _vendored_decode(content)
        return encode_png(nw, nh, ch, box_resize(px, w, h, ch, nw, nh))
    except Exception:
        return None


def _pil_resize(content: bytes, nw: int, nh: int) -> bytes | None:
    """Real resize via Pillow, re-encoded as PNG; undecodable → None
    content (recorded, not fatal)."""
    try:
        from PIL import Image

        img = Image.open(io.BytesIO(content)).resize((nw, nh))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()
    except Exception:
        return None


def resize_images(
    df: DataFrame, max_dim: int = 256, decoder: str | None = None
) -> DataFrame:
    """Arrow-batched image resize: aspect-preserving fit into a
    ``max_dim`` square.  Only image rows are processed, and only
    (media_id, width, height, content) cross into Python — the plumbing
    that matters at 100 TB (binary columns dominate scan bytes, so
    everything else is pruned before the Python boundary; the resized
    table is written back as its own artifact rather than re-joined).

    Pixel kernel selected by ``decoder`` (module docstring): the fake
    stride-subsamples bytes by the area ratio (same length contract as a
    real resize — smaller output, derived from input bytes); ``"pil"``
    decodes, resizes and re-encodes PNG.
    """

    if decoder not in (None, "fake", "pil", "png", "auto"):
        raise ValueError(f"unknown decoder {decoder!r} (fake|pil|png|auto)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mode = _resolve_decoder(decoder, "image resize")
        for pdf in batches:
            out_w, out_h, out_c = [], [], []
            for w, h, c in zip(pdf["width"], pdf["height"], pdf["content"]):
                w = int(w) if pd.notna(w) else 0
                h = int(h) if pd.notna(h) else 0
                nw, nh = _fit_dims(w, h, max_dim)
                c = c if c is not None else b""
                if w > 0 and h > 0 and (nw, nh) != (w, h):
                    if mode == "pil":
                        c = _pil_resize(c, nw, nh)
                    elif mode == "png":
                        c = _png_resize(c, nw, nh)
                    else:
                        # deterministic stand-in: stride-subsample the
                        # bytes by the area ratio (output size shrinks
                        # like a real resize would)
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


# ------------------------------------------------------ perceptual dedup

def perceptual_hash(
    df: DataFrame, decoder: str | None = None
) -> DataFrame:
    """(media_id, phash): 64-bit average-hash over the decoded 64-dim
    feature vector (aHash: bit i set iff feature_i > mean).  Kernel-
    injectable like every multimodal op — with the Pillow decoder this
    is a real image aHash (8x8 grayscale thumbnail); with the fake
    kernel it is a deterministic byte-profile hash, which is exactly
    what the hermetic tests and oracle need.

    Pure Columns after decode: the mean and the bit-packing fold are
    staged behind Generate barriers so neither re-evaluates per bit."""
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
    )

    feats = extract_features(df, dim=64, decoder=decoder).select(
        "media_id", "feature"
    )
    v = F.col("feature")
    staged = compute_behind_barrier(
        feats,
        {
            "_mean": F.aggregate(
                v, F.lit(0.0), lambda a, x: a + x
            )
            / F.size(v)
        },
    )
    m = F.col("_mean")
    phash = F.aggregate(
        F.sequence(F.lit(1), F.lit(64)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(
            F.element_at(F.col("feature"), i.cast("int")) > m, 1
        ).otherwise(0),
    )
    return staged.select("media_id", phash.alias("phash"))


def media_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 6,
    bands: int = 4,
    decoder: str | None = None,
) -> DataFrame:
    """Perceptual near-duplicate pairs: SimHash-style banding on the
    64-bit aHash (two hashes within ``max_hamming`` bits must agree on
    at least one of ``bands`` disjoint 16-bit bands whenever
    max_hamming < bands — the pigeonhole guarantee), then exact Hamming
    verification with ``bit_count(xor)``.

    Shuffle shape: one explode to (band_idx, band_val) rows, one
    equi-join on the band key, one verify join on the two hashes —
    identical to the text SimHash path; 8-byte keys only."""
    hashes = perceptual_hash(df, decoder=decoder).persist()
    width = 64 // bands
    mask = (1 << width) - 1
    band_vals = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("phash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for b in range(bands)
        ]
    )
    exploded = hashes.select(
        "media_id", F.explode(band_vals).alias("bv")
    ).select("media_id", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .distinct()
    )
    return (
        cand.join(
            hashes.select(
                F.col("media_id").alias("id_a"), F.col("phash").alias("_ha")
            ),
            "id_a",
        )
        .join(
            hashes.select(
                F.col("media_id").alias("id_b"), F.col("phash").alias("_hb")
            ),
            "id_b",
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
