"""Streaming MinHash admission — the micro-batch twin of
``operators/dedup.minhash_admit``: a continuous document stream
near-dedups each micro-batch against EVERYTHING admitted so far (an
optional bootstrap corpus state plus all previous batches), at per-batch
cost ∝ batch + one scan of the accumulated signatures.

Layout under ``state_dir``:

- ``sig/``           — optional bootstrap state (a
  :func:`minhash_dedup_batched` work dir's sig parquet); a cold stream
  simply starts without it;
- ``sig_batches/batch=N/`` — each micro-batch's signature slice,
  written with OVERWRITE so a foreachBatch retry (same batch id, same
  input slice — the Structured Streaming recovery contract) replaces
  its own output instead of double-appending;
- ``pairs/batch=N/``  — the batch's verified near-dup pairs
  (id_a, id_b, jaccard), same overwrite discipline.

Batch N's state side is ``sig/`` plus slices ``batch<N`` — its OWN
slice is excluded from the "existing" union (the delta side already
carries it), so a retry recomputes byte-identical pairs.  Streaming
admission over the same batched document set emits exactly the batch
operator's pairs fold (pinned by ``tests/test_streaming_minhash.py``,
including kill/restart).

Scale shape: per batch, the delta's band entries broadcast against a
scan of the accumulated signature columns — the corpus never crosses an
exchange (the ``minhash_admit`` shape, measured in ``docs/SCALE.md``:
100 k docs vs a 10 M-doc state = 3.9 MB shuffle, zero spill).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame

from qualityassurancetool_spark.functions.fs import (
    delete_path,
    list_subdirs,
)


def _batch_slices(
    spark, root: str, exclude: str | None = None
) -> list[str]:
    # Hadoop-FS listing, NOT os.listdir: a remote state_dir (hdfs://,
    # s3a://) would otherwise read as empty and every batch would
    # silently skip its predecessors (review finding).  STRICT name
    # match: minhash_admit materializes candidate scratch as a sibling
    # "batch=N_cand" dir, which a bare prefix filter would misread as
    # a signature slice.
    names = [
        d
        for d in list_subdirs(spark, root, prefix="batch=")
        if d.split("=", 1)[1].isdigit()
    ]
    return [
        posixpath.join(root, d)
        for d in sorted(names, key=lambda d: int(d.split("=", 1)[1]))
        if d != exclude
    ]


def streaming_minhash_admit(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.7,
    hash_mode: str = "fast",
    available_now: bool = True,
    corpus_text: DataFrame | str | None = None,
):
    """Start the checkpointed admission query; returns the
    StreamingQuery.  Same signature knobs as the batch operators (they
    are baked into the stored slices — a bootstrap ``sig/`` must have
    been built with identical knobs).  The knobs are validated against
    ``state_dir``'s ``minhash_meta.json`` up front, and a meta-less
    state (cold stream) gets one WRITTEN — per-batch admission runs
    with ``update_state=False``, which never bakes meta itself, so
    stream-created states would otherwise escape the mismatch
    enforcement forever (review finding, round 8).

    A SLIM bootstrap state (``store_shingles=False``) needs
    ``corpus_text=`` (DataFrame or parquet path of the bootstrap
    corpus's text) — validated here at query construction, not three
    micro-batches in; batch slices carry their own ``_sh``."""
    from qualityassurancetool_spark.operators.dedup import (
        _check_state_meta,
        _write_state_meta,
        minhash_admit,
    )

    spark0 = stream.sparkSession
    meta = _check_state_meta(
        spark0, state_dir, num_hashes, bands, shingle_k, hash_mode
    )
    if meta is None:
        _write_state_meta(
            spark0, state_dir, num_hashes, bands, shingle_k, hash_mode
        )
    elif not meta.get("store_shingles", True) and corpus_text is None:
        raise ValueError(
            f"bootstrap state {state_dir!r} is slim "
            "(store_shingles=False): pass corpus_text= so per-batch "
            "verification can recompute the state side's shingles"
        )

    sig_batches = posixpath.join(state_dir, "sig_batches")
    pairs_root = posixpath.join(state_dir, "pairs")

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        slice_dir = posixpath.join(sig_batches, f"batch={batch_id}")
        # a replayed batch must see the same "existing" set it saw the
        # first time: slices are ordered by id, and batches arrive in
        # order under one checkpoint, so batch<N is exactly that set
        prev = [
            p
            for p in _batch_slices(
                spark, sig_batches, exclude=f"batch={batch_id}"
            )
            if int(p.rsplit("=", 1)[1]) < batch_id
        ]
        pairs = minhash_admit(
            batch_df.select(id_col, text_col),
            state_dir,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
            hash_mode=hash_mode,
            update_state=False,
            delta_sig_path=slice_dir,
            extra_state_paths=prev,
            corpus_text=corpus_text,
        )
        pairs.write.mode("overwrite").parquet(
            posixpath.join(pairs_root, f"batch={batch_id}")
        )
        # the batch's candidate scratch ("batch=N_cand" + its "_ids"/
        # "_sh" siblings) is baked into the pairs parquet now; without
        # this a long-running stream accumulates dead dirs per
        # micro-batch and every slice listing walks the growing set
        # (review finding, round 8)
        delete_path(spark, f"{slice_dir}_cand")
        delete_path(spark, f"{slice_dir}_cand_ids")
        delete_path(spark, f"{slice_dir}_cand_sh")
        delete_path(spark, f"{slice_dir}_cand_passes")

    writer = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_admitted_pairs(spark, state_dir: str) -> DataFrame:
    """All verified near-dup pairs across completed batches."""
    slices = _batch_slices(spark, posixpath.join(state_dir, "pairs"))
    if not slices:
        raise FileNotFoundError(
            f"no pairs batches under {state_dir!r} — has the stream run?"
        )
    return spark.read.parquet(*slices)
