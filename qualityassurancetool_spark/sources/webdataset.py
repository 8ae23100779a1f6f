"""WebDataset-style tar shards — the training-loader container format
for multimodal corpora (one tar per shard; each sample is a group of
files sharing a key: ``{key}.txt``, ``{key}.json``, ``{key}.bin`` …).
Loaders (webdataset, torchdata) stream shards sequentially, so the
writer's jobs are (a) deterministic shard membership, (b) bounded shard
size, (c) idempotent re-runs — the same contract as
``sources/layout.write_corpus_shards``, with tar instead of parquet.

Spark-first shape:
 - membership is the md5 shard hash (re-runs and retries place every
   sample identically; no rand(), no coalesce races);
 - ONE groupBy(shard) + ``applyInPandas`` writes each tar in a single
   task — a shard is by definition loader-sequential, so one writer
   per shard IS the maximum useful parallelism; samples are sorted by
   key inside the tar for byte-stable output;
 - the return value is the manifest (shard, n_samples, n_bytes, path),
   NOT the data — the driver never sees sample bytes;
 - reading is ``binaryFile`` over the tars + ``mapInPandas`` tarfile
   parse → long (key, ext, data) rows.

Size the shard count so a shard fits an executor (the WebDataset norm
is ~1 GB tars); tar members are written with zeroed mtimes so re-runs
are byte-identical.
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard int, n_samples long, n_bytes long, path string"
SAMPLE_SCHEMA = "key string, ext string, data binary"

# the one salt both the writer's self-assign path and callers that
# pre-compute shards (plans/pretrain) must share — tar membership
# parity between the two paths depends on it
WDS_SALT = "wds:"


def shard_of(key_col, n_shards: int, salt: str = WDS_SALT):
    """Deterministic shard id from a sample key (md5, like
    layout/sampling)."""
    h = F.substring(
        F.md5(F.concat(F.lit(salt), key_col.cast("string"))), 1, 15
    )
    return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(n_shards)).cast(
        "int"
    )


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    key_col: str = "doc_id",
    text_col: str | None = "text",
    meta_cols: tuple[str, ...] = (),
    binary_col: str | None = None,
    salt: str = WDS_SALT,
    shard_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``shard-NNNNN.tar`` files under ``path`` and
    return the collected manifest as a (small) DataFrame.

    Each sample becomes ``{key}.txt`` (from ``text_col``), ``{key}.json``
    (the ``meta_cols`` as one JSON object, if any), and ``{key}.bin``
    (from ``binary_col``, if set).  Keys are zero-padded so tar order ==
    lexicographic == numeric order for integer keys.

    ``shard_col``: a PRE-assigned shard id column.  Contract: the frame
    arrives already hash-clustered on it (e.g. a window or aggregation
    partitioned by the same column ran upstream) so the grouped write
    reuses that exchange — one task per hash bucket, whole shards per
    task.  Without it the writer assigns shards itself and inserts an
    explicit ``repartition(n_shards, _shard)``: NEVER rely on whatever
    partitioning the caller left behind — a single-partition upstream
    (any global window) silently satisfies the groupBy distribution and
    ONE worker ends up writing every tar sequentially."""
    os.makedirs(path, exist_ok=True)
    cols = [F.col(key_col).cast("string").alias("_key")]
    if text_col:
        cols.append(F.col(text_col).alias("_text"))
    if binary_col:
        cols.append(F.col(binary_col).alias("_bin"))
    if meta_cols:
        cols.append(
            F.to_json(F.struct(*[F.col(c) for c in meta_cols])).alias(
                "_meta"
            )
        )
    if shard_col is not None:
        slim = df.select(
            F.col(shard_col).cast("int").alias("_shard"), *cols
        )
    else:
        # repartition count: HashPartitioning is murmur3-mod-n, not
        # identity — n_shards keys into exactly n_shards buckets leaves
        # ~37 % of buckets empty and co-locates shards (sequential tar
        # writes inside one task).  4× buckets keeps co-location rare;
        # empty partitions are no-op tasks.
        slim = df.select(
            shard_of(F.col(key_col), n_shards, salt).alias("_shard"),
            *cols,
        ).repartition(max(32, 4 * n_shards), F.col("_shard"))

    has_text, has_bin, has_meta = bool(text_col), bool(binary_col), bool(
        meta_cols
    )

    def write_shard(pdf):
        import pandas as pd

        if not len(pdf):
            return pd.DataFrame(
                columns=["shard", "n_samples", "n_bytes", "path"]
            )
        shard_raw = pdf["_shard"].iloc[0]
        if pd.isna(shard_raw):
            raise ValueError(
                "shard_col contains NULL/non-integer shard ids — "
                "assign every row a shard in [0, n_shards)"
            )
        shard = int(shard_raw)
        if not 0 <= shard < n_shards:
            raise ValueError(
                f"shard id {shard} outside [0, {n_shards}) — "
                "shard_col must agree with n_shards"
            )
        out = os.path.join(path, f"shard-{shard:05d}.tar")
        tmp = out + ".tmp"
        pdf = pdf.sort_values("_key", key=lambda s: s.str.zfill(24))
        # NB: itertuples renames underscore-leading columns; iterate
        # parallel column lists instead
        keys = pdf["_key"].tolist()
        texts = pdf["_text"].tolist() if has_text else [None] * len(keys)
        metas = pdf["_meta"].tolist() if has_meta else [None] * len(keys)
        bins_ = pdf["_bin"].tolist() if has_bin else [None] * len(keys)
        with tarfile.open(tmp, "w") as tf:
            for key_raw, text, meta, bin_ in zip(keys, texts, metas, bins_):
                key = key_raw.zfill(12)

                def add(name: str, payload: bytes) -> None:
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    info.mtime = 0  # byte-stable re-runs
                    tf.addfile(info, io.BytesIO(payload))

                if has_text:
                    add(f"{key}.txt", (text or "").encode("utf-8"))
                if has_meta:
                    add(f"{key}.json", (meta or "{}").encode("utf-8"))
                if has_bin:
                    add(f"{key}.bin", bytes(bin_ or b""))
        os.replace(tmp, out)  # atomic: re-runs overwrite, never append
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_samples": [len(pdf)],
                "n_bytes": [os.path.getsize(out)],
                "path": [out],
            }
        )

    manifest = (
        slim.groupBy("_shard")
        .applyInPandas(lambda _, pdf: write_shard(pdf), MANIFEST_SCHEMA)
        .collect()
    )
    return df.sparkSession.createDataFrame(manifest, MANIFEST_SCHEMA)


def read_webdataset_shards(spark: SparkSession, path: str) -> DataFrame:
    """Long-format samples (key, ext, data binary) from every
    ``*.tar`` under ``path`` — one input task per tar (a shard is the
    parallelism unit on the read side too)."""
    bins = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    ).select("content")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            keys, exts, datas = [], [], []
            for blob in pdf["content"]:
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        stem, ext = m.name.rsplit(".", 1)
                        keys.append(stem.lstrip("0") or "0")
                        exts.append(ext)
                        datas.append(tf.extractfile(m).read())
            yield pd.DataFrame({"key": keys, "ext": exts, "data": datas})

    return bins.mapInPandas(parse, SAMPLE_SCHEMA)
