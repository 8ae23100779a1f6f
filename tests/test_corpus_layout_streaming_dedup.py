"""Corpus shard layout (sources/layout.write_corpus_shards) and
streaming exact dedup (streaming/micro_batch.streaming_exact_dedup)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from qualityassurancetool_spark.schema import load_table
from qualityassurancetool_spark.sources.layout import write_corpus_shards
from qualityassurancetool_spark.streaming.micro_batch import (
    streaming_exact_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_shards_deterministic_and_idempotent(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "corpus")
    write_corpus_shards(docs, path, n_shards=4)

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # shard dirs exist and membership is the documented hash
    dirs = glob.glob(f"{path}/lang=*/shard=*")
    assert dirs and len(dirs) <= back.select("lang").distinct().count() * 4
    from qualityassurancetool_spark.operators.sampling import uniform_hash

    mism = back.withColumn(
        "_want",
        F.floor(uniform_hash(F.col("doc_id"), "shard:") * 4.0).cast("int"),
    ).where(F.col("_want") != F.col("shard"))
    assert mism.count() == 0

    # shard contents are a pure function of the data: snapshot, rewrite,
    # compare per-shard id sets
    def shard_sets():
        rows = (
            spark.read.parquet(path)
            .groupBy("lang", "shard")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .collect()
        )
        return {(r["lang"], r["shard"]): tuple(r["ids"]) for r in rows}

    first = shard_sets()
    write_corpus_shards(docs, path, n_shards=4)  # idempotent re-run
    assert shard_sets() == first


def test_corpus_shards_partial_overwrite_touches_only_written_langs(
    spark, tmp_path
):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "corpus2")
    write_corpus_shards(docs, path, n_shards=2)
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    assert len(langs) >= 2
    keep, rewrite = langs[0], langs[1]
    before = (
        spark.read.parquet(path)
        .where(F.col("lang") == keep)
        .count()
    )
    # rewrite ONE language partition; the other must be untouched
    write_corpus_shards(
        docs.where(F.col("lang") == rewrite), path, n_shards=2
    )
    after = spark.read.parquet(path).where(F.col("lang") == keep).count()
    assert after == before


def test_streaming_exact_dedup_keeps_one_per_digest(spark, tmp_path):
    rows = [
        (1, "Hello  World", "2024-01-01 00:00:00"),
        (2, "hello world", "2024-01-01 00:10:00"),   # dup of 1 (normalized)
        (3, "something else", "2024-01-01 00:20:00"),
        (4, "HELLO   world", "2024-01-01 00:30:00"),  # dup of 1
    ]
    src = spark.createDataFrame(
        rows, "doc_id long, text string, ingest_ts string"
    ).withColumn("ingest_ts", F.to_timestamp("ingest_ts"))
    path = str(tmp_path / "stream_src")
    src.coalesce(1).write.parquet(path)

    stream = spark.readStream.schema(src.schema).parquet(path)
    deduped = streaming_exact_dedup(stream, watermark="1 hour")
    q = (
        deduped.select("doc_id", "content_hash")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_stream").collect()
    # one survivor per digest: 2 distinct digests
    assert len(got) == 2
    assert len({r["content_hash"] for r in got}) == 2
    assert {r["doc_id"] for r in got} <= {1, 2, 3, 4}
    assert any(r["doc_id"] == 3 for r in got)
