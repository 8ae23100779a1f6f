"""End-to-end pretraining-corpus pipeline — the corpus-side capstone
composition (the training-data twin of ``plans/qc_pipeline``'s check
chain): one callable takes raw documents to loader-ready shards with a
full audit trail.

Stages (each an engine operator; every stage optional via config):

 1. ingest      — parquet documents table or JSONL with quarantine;
 2. curate      — the one-pass decision sheet (lang/quality/
                  repetition/PII/blocklist/classifier rules, exact
                  dedup, per-lang sampling);
 3. near-dedup  — MinHash-LSH verified pairs → connected components →
                  keep the min-id representative per cluster (fed back
                  into the SAME decision sheet as the
                  ``near_duplicate`` rule, so drop accounting stays in
                  one place);
 4. chunk+pack  — token-window chunks, fixed-budget packing;
 5. write       — WebDataset tar shards (or parquet), plus the
                  decisions sheet and per-rule kill report.

Determinism end to end: every stage is md5-keyed (no rand()), so a
re-run writes byte-identical shards — the property that makes a 100 TB
build resumable and auditable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qualityassurancetool_spark.config import ConfigError
from qualityassurancetool_spark.plans.curation import (
    CurationConfig,
    curate,
    drop_report,
)


@dataclass
class PretrainConfig:
    curation: CurationConfig = field(default_factory=CurationConfig)
    near_dedup: bool = True
    minhash_threshold: float = 0.7
    # >0 routes near-dedup through minhash_dedup_batched (bounded peak
    # state, bit-identical pairs — docs/SCALE.md round-8 decade); the
    # scratch parquet lands under <out_dir>/minhash_work
    minhash_band_batches: int = 0
    chunk_tokens: int = 512
    overlap_tokens: int = 64
    pack_budget: int = 2048
    n_shards: int = 8
    output_format: str = "webdataset"  # webdataset | parquet

    @classmethod
    def from_dict(cls, d: dict) -> "PretrainConfig":
        known = {
            "curation", "near_dedup", "minhash_threshold",
            "minhash_band_batches", "chunk_tokens",
            "overlap_tokens", "pack_budget", "n_shards", "output_format",
        }
        unknown = set(d) - known
        if unknown:
            raise ConfigError(f"unknown pretrain keys: {sorted(unknown)}")
        fmt = d.get("output_format", "webdataset")
        if fmt not in ("webdataset", "parquet"):
            raise ConfigError(
                f"output_format must be webdataset|parquet, got {fmt!r}"
            )
        return cls(
            curation=CurationConfig.from_dict(d.get("curation", {}) or {}),
            near_dedup=bool(d.get("near_dedup", True)),
            minhash_threshold=float(d.get("minhash_threshold", 0.7)),
            minhash_band_batches=int(d.get("minhash_band_batches", 0)),
            chunk_tokens=int(d.get("chunk_tokens", 512)),
            overlap_tokens=int(d.get("overlap_tokens", 64)),
            pack_budget=int(d.get("pack_budget", 2048)),
            n_shards=int(d.get("n_shards", 8)),
            output_format=fmt,
        )


def run_pretrain_pipeline(
    docs: DataFrame,
    cfg: PretrainConfig,
    out_dir: str,
    classifier_model: tuple[list[float], float] | None = None,
) -> dict:
    """Documents in, shards + audit out.  Returns the report dict:
    per-rule kill counts, chunk/pack counts, shard manifest rows."""
    import os

    from qualityassurancetool_spark.operators.chunking import (
        chunk_documents,
        pack_documents,
    )

    near_drops = None
    if cfg.near_dedup:
        from qualityassurancetool_spark.operators.components import (
            connected_components,
        )
        from qualityassurancetool_spark.operators.dedup import (
            minhash_dedup,
            minhash_dedup_batched,
        )

        if cfg.minhash_band_batches > 0:
            pairs = minhash_dedup_batched(
                docs,
                os.path.join(out_dir, "minhash_work"),
                threshold=cfg.minhash_threshold,
                hash_mode="fast",
                band_batches=cfg.minhash_band_batches,
            )
        else:
            pairs = minhash_dedup(
                docs, threshold=cfg.minhash_threshold, hash_mode="fast"
            )
        comp = connected_components(pairs)
        # keeper per component = min id among members that PASS the
        # non-dedup curation rules — a representative that fails
        # curation must not drag its surviving near-copies down with it
        # (the content would vanish entirely; curate's exact-dedup
        # keeper has the same exemption — review finding, round 8).
        # The pre-pass decision sheet runs over CLUSTERED docs only
        # (duplication-rate-sized, never the corpus).
        import dataclasses

        from pyspark.sql import Window

        pre_cfg = dataclasses.replace(
            cfg.curation, dedup="none", sample_fractions=None
        )
        clustered = docs.join(
            comp.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
        )
        pre = curate(
            clustered, pre_cfg, classifier_model=classifier_model
        ).select(F.col("doc_id").alias("id"), "keep")
        w_comp = Window.partitionBy("component")
        ranked = comp.join(pre, "id").withColumn(
            "_keeper",
            F.coalesce(
                F.min(F.when(F.col("keep"), F.col("id"))).over(w_comp),
                # no member passes: fall back to min id (the whole
                # cluster dies by its own rules anyway)
                F.min("id").over(w_comp),
            ),
        )
        near_drops = ranked.filter(
            F.col("id") != F.col("_keeper")
        ).select(F.col("id").alias("doc_id"))

    decisions = curate(
        docs,
        cfg.curation,
        classifier_model=classifier_model,
        near_dup_drops=near_drops,
    )
    os.makedirs(out_dir, exist_ok=True)
    decisions_path = os.path.join(out_dir, "decisions")
    decisions.write.mode("overwrite").parquet(decisions_path)
    decisions = docs.sparkSession.read.parquet(decisions_path)
    kept = decisions.where("keep").select("doc_id", "text")

    chunks = chunk_documents(
        kept,
        chunk_tokens=cfg.chunk_tokens,
        overlap_tokens=cfg.overlap_tokens,
    )
    # shard FIRST, pack WITHIN each shard: global packing is an empty
    # Window.partitionBy() — an Exchange SinglePartition funnelling every
    # chunk through one task, and the single partition then trivially
    # satisfies the writer's groupBy distribution so ALL tar files were
    # written sequentially by one Python worker (caught red-handed by
    # the 10 M-doc dress rehearsal: one task, 16 tars, ~1 GB/each).
    # The shard expression is the same md5 the writer uses, so tar
    # MEMBERSHIP is unchanged; pack_id becomes shard-local — which is
    # what a loader consumes anyway (a tar IS the unit a reader opens),
    # and one hash exchange on _shard now serves both the pack window
    # and the shard write.
    from qualityassurancetool_spark.sources.webdataset import (
        WDS_SALT,
        shard_of,
    )

    # seq_id packs (doc_id, chunk_idx) into one long for ordering and
    # tar keys; the multiplier bounds chunks/doc at 1 M (64 M tokens at
    # 64-token chunks) and the guard raises instead of silently
    # colliding with the next doc's chunk 0 (which would also corrupt
    # shard membership); doc_id must stay below ~9.2e12 to avoid the
    # int64 wrap.
    seq_id = F.when(
        F.col("chunk_idx") < 1_000_000,
        F.col("doc_id") * 1_000_000 + F.col("chunk_idx"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("chunk_idx >= 1e6 for doc_id "),
                F.col("doc_id").cast("string"),
                F.lit(" — seq_id would collide; re-chunk with a "
                      "larger chunk_tokens"),
            )
        )
    )
    packed = pack_documents(
        chunks.select(
            F.concat_ws(
                "#",
                F.col("doc_id").cast("string"),
                F.col("chunk_idx").cast("string"),
            ).alias("chunk_key"),
            seq_id.alias("seq_id"),
            F.col("chunk_text"),
            F.col("n_chunk_tokens").alias("n_tokens"),
        ).withColumn(
            "_shard",
            shard_of(F.col("seq_id"), cfg.n_shards, WDS_SALT),
        ),
        budget_tokens=cfg.pack_budget,
        token_col="n_tokens",
        id_col="seq_id",
        max_doc_tokens=cfg.chunk_tokens,
        partition_cols=["_shard"],
    )

    # n_chunks comes from the WRITE below, never a pre-write count():
    # counting the lazy frame executes the whole chunk+pack DAG twice
    # (review finding, round 8 — same class as the decisions read-back
    # above)
    report: dict = {
        "rules": {
            r["rule"]: r["n"] for r in drop_report(decisions).collect()
        },
    }
    if cfg.output_format == "webdataset":
        from qualityassurancetool_spark.sources.webdataset import (
            write_webdataset_shards,
        )

        manifest = write_webdataset_shards(
            packed,
            os.path.join(out_dir, "shards"),
            n_shards=cfg.n_shards,
            key_col="seq_id",
            text_col="chunk_text",
            meta_cols=("chunk_key", "pack_id", "n_tokens"),
            shard_col="_shard",
        )
        rows = manifest.collect()
        report["shards"] = {
            int(r["shard"]): int(r["n_samples"]) for r in rows
        }
        report["shard_bytes"] = sum(int(r["n_bytes"]) for r in rows)
        report["n_chunks"] = sum(int(r["n_samples"]) for r in rows)
    else:
        # pack_id is dense PER SHARD now — keep the shard column (as a
        # real name) so (shard, pack_id) stays the pack key; dropping it
        # would alias up to n_shards unrelated packs per pack_id
        packed.withColumnRenamed("_shard", "shard").write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "packed"))
        report["shards"] = None
        report["n_chunks"] = (
            docs.sparkSession.read.parquet(
                os.path.join(out_dir, "packed")
            ).count()
        )
    return report
