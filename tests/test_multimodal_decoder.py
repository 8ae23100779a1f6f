"""Injectable multimodal decode kernels: fake/auto parity in this
hermetic container, pointed failure for decoder="pil" without Pillow,
real-Pillow tests skip-marked for codec-equipped images."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from qualityassurancetool_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
)

try:
    import PIL  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _media_df(spark):
    rows = [
        Row(media_id=1, kind="image", mime="image/png",
            content=bytes(range(200)) * 40, width=400, height=300,
            duration_s=None),
        Row(media_id=2, kind="audio", mime="audio/wav",
            content=b"RIFF" * 500, width=None, height=None, duration_s=8.5),
        Row(media_id=3, kind="image", mime="image/png",
            content=b"tiny", width=16, height=16, duration_s=None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_fake_auto_parity_without_pil(spark):
    """No Pillow in this image ⇒ auto resolves to fake: identical output
    for default, explicit fake, and auto decoders."""
    df = _media_df(spark)
    base = sorted(map(tuple, extract_features(df).collect()))
    for dec in ("fake", "auto"):
        assert sorted(
            map(tuple, extract_features(df, decoder=dec).collect())
        ) == base
    rbase = sorted(map(tuple, resize_images(df, max_dim=64).collect()))
    assert sorted(
        map(tuple, resize_images(df, max_dim=64, decoder="auto").collect())
    ) == rbase


@pytest.mark.skipif(HAVE_PIL, reason="Pillow present: pil decoder works")
def test_pil_decoder_pointed_failure(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    df = _media_df(spark)
    with pytest.raises((PySparkException, Py4JJavaError, Exception)) as ei:
        extract_features(df, decoder="pil").collect()
    assert "Pillow" in str(ei.value)


def test_unknown_decoder_fails_eagerly(spark):
    df = _media_df(spark)
    with pytest.raises(ValueError, match="unknown decoder"):
        extract_features(df, decoder="jpeg2000")
    with pytest.raises(ValueError, match="unknown decoder"):
        resize_images(df, decoder="jpeg2000")


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed")
def test_pil_real_roundtrip(spark):  # pragma: no cover - env-dependent
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (64, 48), (200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [Row(media_id=1, kind="image", mime="image/png",
             content=buf.getvalue(), width=64, height=48, duration_s=None)],
        MEDIA_SCHEMA,
    )
    feat = extract_features(df, dim=4, decoder="pil").collect()[0]
    assert len(feat["feature"]) == 4
    out = resize_images(df, max_dim=32, decoder="pil").collect()[0]
    assert (out["width"], out["height"]) == (32, 24)
    img = Image.open(io.BytesIO(out["content"]))
    assert img.size == (32, 24)


def test_perceptual_near_dup(spark):
    """aHash banding finds a byte-appended clone at Hamming ~0; unrelated
    payloads stay apart; the pigeonhole guarantee holds (hamming < bands
    implies a shared band, so verified pairs are complete up to
    max_hamming < 4)."""
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.operators.multimodal import (
        media_near_dup_pairs,
        perceptual_hash,
    )

    rows = [
        (1, b"A" * 200 + b"B" * 200),
        (2, b"A" * 200 + b"B" * 199 + b"C"),   # near-dup of 1
        (3, bytes(range(256)) * 2),            # different profile
    ]
    df = spark.createDataFrame(
        [(i, "image", "application/octet-stream", c) for i, c in rows],
        "media_id long, kind string, mime string, content binary",
    )
    ph = {r["media_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert len(set(ph.values())) >= 2
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs
    # exhaustive-verify completeness check for hamming < bands
    for (a, b), d in pairs.items():
        assert bin((ph[a] ^ ph[b]) & ((1 << 64) - 1)).count("1") == d
