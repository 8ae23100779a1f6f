"""Dedup / similarity / text / multimodal operator tests on the driver
testdata plus hand-built micro-fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.dedup import (
    exact_dedup,
    hamming_distance,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)
from qualityassurancetool_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    MEDIA_SCHEMA,
)
from qualityassurancetool_spark.operators.similarity import (
    brute_force_topk,
    cosine_similarity,
    lsh_topk,
)
from qualityassurancetool_spark.operators.text import (
    analyze,
    predict_lang,
    token_count,
)

DOC_SCHEMA = "doc_id long, text string, lang string, n_chars long"


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", 43),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en", 43),  # near dup
        (3, "der schnelle braune fuchs springt und springt", "de", 45),
        (4, "completely different content about spark engines", "en", 48),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_exact_dedup(spark, docs):
    out = exact_dedup(docs).collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in out}
    assert by_keep[0] == 2  # docs 0 and 1 collapse
    assert len(out) == 4


def test_minhash_finds_near_dup(spark, docs):
    # 8 bands × 2 rows: a 0.75-jaccard pair collides with p≈0.999
    pairs = minhash_dedup(docs, num_hashes=16, bands=8, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got  # exact dup always survives
    # jaccard of 0 vs 2 on 3-shingles is high; (0,2) or (1,2) should appear
    assert any(p in got for p in [(0, 2), (1, 2)])
    # unrelated docs never pair
    assert not any(4 in p for p in got)


def test_simhash_similar_docs_close(spark, docs):
    out = docs.select(
        "doc_id", simhash(F.col("text")).alias("sh")
    ).collect()
    sh = {r["doc_id"]: r["sh"] for r in out}
    assert sh[0] == sh[1]
    df = spark.createDataFrame(
        [(sh[0], sh[2]), (sh[0], sh[4])], "a long, b long"
    ).select(hamming_distance(F.col("a"), F.col("b")).alias("d"))
    d_near, d_far = [r["d"] for r in df.collect()]
    assert d_near < d_far


def test_ngram_jaccard_pairs(spark, docs):
    out = ngram_jaccard_pairs(
        docs, block_cols=["lang"], length_bucket=64, threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert got[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) in got


def test_brute_force_gemm_matches_fold(spark, sf_dir):
    """The GEMM scale path and the sequential-fold path agree at 6-dp
    rounding, including boundary tie-breaks (exact lexicographic local
    top-k — see the batch-tie note in _brute_force_topk_gemm)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)

    def norm(strategy):
        out = brute_force_topk(emb, queries, k=7, strategy=strategy)
        return sorted(
            (r["query_id"], r["neighbor_id"], round(r["cosine"], 6))
            for r in out.collect()
        )

    assert norm("fold") == norm("gemm")


def test_ngram_jaccard_hot_block_cap_is_exact(spark):
    """Oversized (lang, length-bucket) blocks switch to the prefix-filter
    join; the capped path must return IDENTICAL pairs to uncapped
    all-pairs — the cap is a physical strategy change, not a semantic
    one."""
    # one hot English block: 40 docs in the same length bucket, built from
    # overlapping word windows so many pairs straddle the 0.5 threshold
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()
    rows = []
    for i in range(40):
        chunk = [words[(i + j) % len(words)] for j in range(8)]
        rows.append((i, " ".join(chunk), "en", 50))
    # plus a cold German block that must stay on the all-pairs path
    rows += [
        (100, "der schnelle braune fuchs springt", "de", 33),
        (101, "der schnelle braune fuchs springt hoch", "de", 38),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)

    def run(cap):
        out = ngram_jaccard_pairs(
            df,
            block_cols=["lang"],
            length_bucket=64,
            threshold=0.5,
            max_block_rows=cap,
        ).collect()
        return {(r["id_a"], r["id_b"]): round(r["jaccard"], 9) for r in out}

    uncapped = run(None)
    capped = run(8)  # forces the en block (40 > 8) onto the prefix path
    assert capped == uncapped
    assert (100, 101) in capped  # cold block still pairs
    # sanity: the hot block actually produced threshold-passing pairs
    assert any(a < 100 and b < 100 for a, b in capped)


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    out = brute_force_topk(emb, queries, k=5).collect()

    import pandas as pd

    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(3):
        qi = np.where(ids == qid)[0][0]
        sims = mat @ mat[qi] / (norms * norms[qi])
        order = [
            int(ids[j])
            for j in np.argsort(-sims, kind="stable")
            if ids[j] != qid
        ][:5]
        got = sorted(
            [r for r in out if r["query_id"] == qid],
            key=lambda r: (-r["cosine"], r["neighbor_id"]),
        )
        assert [r["neighbor_id"] for r in got] == order
        for r in got:
            j = np.where(ids == r["neighbor_id"])[0][0]
            assert r["cosine"] == pytest.approx(sims[j], rel=1e-9)


def test_lsh_topk_recall_reasonable(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, dim=64, k=5, n_planes=2).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # LSH is approximate (and these embeddings are near-uniform random —
    # the worst case for hyperplane LSH): require non-trivial recall only
    assert len(approx_set & exact_set) >= 3
    assert all(q != n for q, n in approx_set)


def test_blocked_cosine_pairs_matches_fold_path(spark, sf_dir):
    from qualityassurancetool_spark.operators.similarity import (
        blocked_cosine_pairs,
        dot_product,
        l2_norm,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    gemm = blocked_cosine_pairs(
        emb, block_col="label", id_col="vec_id", threshold=0.35
    ).collect()
    n = emb.select(
        "vec_id", "label", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    a, b = n.alias("a"), n.alias("b")
    fold = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            (
                dot_product(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.35)
        .collect()
    )
    gemm_map = {(r["vec_id_a"], r["vec_id_b"]): r["cosine"] for r in gemm}
    fold_map = {(r["vec_id_a"], r["vec_id_b"]): r["cosine"] for r in fold}
    assert set(gemm_map) == set(fold_map)
    for k in fold_map:
        assert gemm_map[k] == pytest.approx(fold_map[k], abs=1e-9)
    # every pair is ordered and same-block by construction
    assert all(ia < ib for ia, ib in gemm_map)


def test_blocked_cosine_pairs_degenerate_blocks(spark):
    df = spark.createDataFrame(
        [
            (0, "solo", [1.0, 0.0]),
            (1, "pair", [1.0, 0.0]),
            (2, "pair", [1.0, 0.0]),
        ],
        "vec_id long, label string, embedding array<double>",
    )
    from qualityassurancetool_spark.operators.similarity import (
        blocked_cosine_pairs,
    )

    out = blocked_cosine_pairs(df, threshold=0.5).collect()
    assert [(r["vec_id_a"], r["vec_id_b"]) for r in out] == [(1, 2)]
    assert out[0]["cosine"] == pytest.approx(1.0)


def test_token_count_and_lang(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is here"),
            (1, "der hund und die katze nicht das"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n"], r["lang"])
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n"),
            predict_lang(F.col("text")).alias("lang"),
        ).collect()
    }
    assert out[0] == (7, "en")
    assert out[1] == (7, "de")
    assert out[2] == (0, "und")


def test_analyze_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = analyze(docs)
    row = out.limit(5).collect()
    assert {"predicted_lang", "n_tokens", "avg_token_len", "quality_score", "fingerprint"} <= set(out.columns)
    for r in row:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_tokens"] > 0


def test_multimodal_feature_plumbing(spark):
    rows = [
        (1, "image", "image/png", bytes(range(100)), 10, 10, None),
        (2, "audio", "audio/wav", b"\x00\x7f" * 50, None, None, 2.5),
        (3, "video", "video/mp4", b"xyz" * 10, 64, 48, 3.0),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(df, dim=4).collect()
    assert len(feats) == 3
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 100
    assert len(by_id[1]["feature"]) == 4
    assert all(0.0 <= v <= 1.0 for v in by_id[1]["feature"])
    # deterministic
    feats2 = extract_features(df, dim=4).collect()
    assert {r["media_id"]: r["feature"] for r in feats2} == {
        r["media_id"]: r["feature"] for r in feats
    }

    frames = frame_sample_plan(df, every_s=1.0).collect()
    assert len(frames) == 3  # 3s video @ 1fps
    assert [r["frame_idx"] for r in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2]


def test_ivf_topk_probes_subset_with_valid_scores(spark, sf_dir):
    from qualityassurancetool_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = emb.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    queries = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, centroids, k=5, nprobe=2).collect()
    # every query gets k results (inverted lists are non-empty here)
    per_q = {}
    for r in approx:
        per_q.setdefault(r["query_id"], []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in per_q.values())
    # approximate scores are true cosines: each (q, n) pair present in the
    # exact run must carry the identical score
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    hits = 0
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert r["cosine"] == pytest.approx(exact_scores[key], rel=1e-9)
            hits += 1
    assert hits >= 3  # non-trivial recall on near-uniform random data


def test_sessionize_boundaries_and_single_shuffle(spark):
    import datetime as dt

    from qualityassurancetool_spark.operators.sessionize import (
        session_stats,
        with_session_ids,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: events at 0s, 10s, big gap, 2000s, 2010s -> 2 sessions
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(seconds=10)),
        (3, 1, t0 + dt.timedelta(seconds=2000)),
        (4, 1, t0 + dt.timedelta(seconds=2010)),
        # user 2: single event -> 1 session, duration 0
        (5, 2, t0),
        # gap exactly == threshold must NOT split (strictly greater splits)
        (6, 3, t0),
        (7, 3, t0 + dt.timedelta(seconds=600)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    sess = with_session_ids(df, gap=600, order_extra=["event_id"])
    got = {r["event_id"]: r["session_idx"] for r in sess.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1, 6: 1, 7: 1}

    stats = session_stats(df, gap=600, order_extra=["event_id"])
    by_key = {(r["user_id"], r["session_idx"]): r for r in stats.collect()}
    assert by_key[(1, 1)]["n_events"] == 2
    assert by_key[(1, 2)]["duration_sec"] == 10.0
    assert by_key[(2, 1)]["duration_sec"] == 0.0
    assert by_key[(3, 1)]["n_events"] == 2

    # scale property: exactly ONE exchange (by user) in the whole plan —
    # the session window and the aggregation share the partitioning
    plan = stats._jdf.queryExecution().executedPlan().toString()
    # AQE prints the plan twice (Final + Initial) once a stage ran;
    # count only the final section
    plan = plan.split("== Initial Plan ==")[0]
    import re

    n_exchanges = len(re.findall(r"\+- Exchange hashpartitioning", plan))
    assert n_exchanges == 1, plan


def test_multimodal_resize_plumbing(spark):
    import pandas as pd

    from qualityassurancetool_spark.operators.multimodal import (
        _fit_dims,
        resize_images,
    )

    # pure kernel math: aspect preserved, never upscales, floors at 1
    assert _fit_dims(1024, 512, 256) == (256, 128)
    assert _fit_dims(512, 1024, 256) == (128, 256)
    assert _fit_dims(100, 50, 256) == (100, 50)       # no upscale
    assert _fit_dims(10000, 3, 256) == (256, 1)

    rows = [
        (1, "image", None, bytes(range(256)) * 16, 1024, 512, None),
        (2, "image", None, b"abcd", 100, 50, None),    # already small
        (3, "video", None, b"xxxx", None, None, 5.0),  # filtered out
        (4, "image", None, None, 640, 480, None),      # null payload
    ]
    from qualityassurancetool_spark.operators.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_images(df, max_dim=256).collect()}

    assert set(out) == {1, 2, 4}                       # only images
    assert (out[1]["width"], out[1]["height"]) == (256, 128)
    # deterministic subsample: area ratio (1024*512)/(256*128) = 16
    assert out[1]["content"] == (bytes(range(256)) * 16)[::16]
    assert (out[2]["width"], out[2]["height"]) == (100, 50)
    assert out[2]["content"] == b"abcd"                # untouched
    assert out[4]["content"] == b""                    # null -> empty

    # determinism across runs (retry-safe at scale)
    again = {r["media_id"]: r for r in resize_images(df, max_dim=256).collect()}
    assert {k: v["content"] for k, v in out.items()} == {
        k: v["content"] for k, v in again.items()
    }


@pytest.mark.parametrize("hash_mode", ["fast", "portable"])
@pytest.mark.parametrize("band_batches", [1, 3, 8, 16, 24])
def test_minhash_batched_parity(spark, tmp_path, hash_mode, band_batches):
    """minhash_dedup_batched must emit EXACTLY the monolithic pipeline's
    verified pairs (same signatures, same candidate bands, same Jaccard)
    for every batching schedule — the sharded 100-M-doc discipline is a
    pure execution-schedule change.  band_batches > bands (16, 24 with
    bands=8) exercises the round-9 sub-band hash-sliced passes."""
    from qualityassurancetool_spark.operators.dedup import (
        minhash_dedup,
        minhash_dedup_batched,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(300)
    kw = dict(
        num_hashes=16, bands=8, shingle_k=3, threshold=0.5,
        hash_mode=hash_mode,
    )
    mono = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_dedup(docs, **kw).collect()
    }
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_dedup_batched(
            docs,
            str(tmp_path / f"mh_{hash_mode}_{band_batches}"),
            band_batches=band_batches,
            **kw,
        ).collect()
    }
    assert got == mono
    assert len(mono) > 0


def test_minhash_batched_null_text_parity(spark, tmp_path):
    """NULL-text docs pair with each other at jaccard 1.0 in BOTH
    variants (the monolithic form's shingle array is [NULL] -> all-NULL
    sigs -> shared md5('') band hash; the batched form reproduces that
    verbatim).  This pins the shared convention: 'no text' matches 'no
    text' — drop null texts upstream if unwanted."""
    from qualityassurancetool_spark.operators.dedup import (
        minhash_dedup,
        minhash_dedup_batched,
    )

    rows = [(0, None), (1, None), (2, "a b"), (3, "totally different words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.1)
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_batched(
            docs, str(tmp_path / "mh_null"), **kw
        ).collect()
    }
    mono = {
        (r["id_a"], r["id_b"]) for r in minhash_dedup(docs, **kw).collect()
    }
    assert got == mono == {(0, 1)}


def test_minhash_batched_slim_storage_parity(spark, tmp_path):
    """store_shingles=False (round-10): the sig parquet drops the _sh
    arrays (~90 % of its bytes) and verify recomputes shingles from the
    SOURCE text for candidate ids only — output must stay bit-identical
    to the full-storage batched form AND the monolithic form, including
    the null-text pairing convention.  Admission must refuse the
    shingle-less state loudly (its state side has no text)."""
    import os

    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup,
        minhash_dedup_batched,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(300)
    nulls = spark.createDataFrame(
        [(900001, None), (900002, None)], "doc_id long, text string"
    )
    docs = docs.select("doc_id", "text").unionByName(nulls)
    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    key = lambda df: {  # noqa: E731
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    }
    mono = key(minhash_dedup(docs, **kw))
    slim_dir = tmp_path / "mh_slim"
    slim = key(
        minhash_dedup_batched(
            docs, str(slim_dir), band_batches=16,
            store_shingles=False, **kw,
        )
    )
    assert slim == mono and len(mono) > 0

    # the artifact actually shrank: no _sh column in the sig parquet
    import pyarrow.parquet as pq

    sig_dir = slim_dir / "sig"
    part = next(
        f for f in os.listdir(sig_dir) if f.endswith(".parquet")
    )
    names = pq.read_schema(str(sig_dir / part)).names
    assert "_sh" not in names and "sig_0" in names

    # a shingle-less work dir cannot seed admission
    delta = spark.createDataFrame(
        [(900100, "fresh text")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="store_shingles=False"):
        minhash_admit(delta, str(slim_dir), **kw)


def test_minhash_batched_validation(spark, tmp_path):
    from qualityassurancetool_spark.operators.dedup import (
        minhash_dedup_batched,
    )

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="band_batches"):
        minhash_dedup_batched(docs, str(tmp_path), bands=4, band_batches=5)
    with pytest.raises(ValueError, match="multiple"):
        minhash_dedup_batched(docs, str(tmp_path), bands=4, band_batches=6)
    with pytest.raises(ValueError, match="divide"):
        minhash_dedup_batched(docs, str(tmp_path), num_hashes=16, bands=5)
    with pytest.raises(ValueError, match="hash_mode"):
        minhash_dedup_batched(docs, str(tmp_path), hash_mode="md5")


@pytest.mark.parametrize("hash_mode", ["fast", "portable"])
def test_minhash_admit_parity(spark, tmp_path, hash_mode):
    """Admission output == the monolithic pipeline over (corpus UNION
    delta), restricted to pairs touching a delta doc — the incremental
    path changes the schedule, never the pairs."""
    from qualityassurancetool_spark.operators.dedup import (
        minhash_dedup,
        minhash_dedup_batched,
        minhash_admit,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(300)
    delta = docs.where(F.col("doc_id") % 7 == 0)
    base = docs.where(F.col("doc_id") % 7 != 0)
    kw = dict(
        num_hashes=16, bands=8, shingle_k=3, threshold=0.5,
        hash_mode=hash_mode,
    )
    state = str(tmp_path / f"state_{hash_mode}")
    minhash_dedup_batched(base, state, **kw).count()  # bootstrap state
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_admit(delta, state, **kw).collect()
    }
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    want = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_dedup(docs, **kw).collect()
        if r["id_a"] in delta_ids or r["id_b"] in delta_ids
    }
    assert got == want
    assert len(want) > 0


def test_minhash_admit_updates_state(spark, tmp_path):
    """With update_state, the next admission sees the previous delta:
    an exact re-submission of a doc admitted in round 1 must pair with
    it at jaccard 1.0."""
    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup_batched,
    )

    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    minhash_dedup_batched(base, state, **kw).count()

    d1 = spark.createDataFrame(
        [(10, "one two three four five six seven")],
        "doc_id long, text string",
    )
    assert minhash_admit(d1, state, **kw).count() == 0

    d2 = spark.createDataFrame(
        [(20, "one two three four five six seven")],  # re-submission
        "doc_id long, text string",
    )
    out = minhash_admit(d2, state, **kw).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(10, 20)}
    assert out[0]["jaccard"] == 1.0

    # update_state=False leaves the state frozen
    d3 = spark.createDataFrame(
        [(30, "one two three four five six seven")],
        "doc_id long, text string",
    )
    frozen = minhash_admit(d3, state, update_state=False, **kw)
    assert {(r["id_a"], r["id_b"]) for r in frozen.collect()} == {
        (10, 30), (20, 30)
    }
    again = minhash_admit(d3, state, update_state=False, **kw)
    assert again.count() == 2  # 30 was not folded in


def test_minhash_admit_admission_id_retry_idempotent(spark, tmp_path):
    """admission_id= makes batch admission retry-idempotent: replaying
    the same admission overwrites its own slices, so state and pairs
    converge instead of double-appending (VERDICT r8 item 2 — the
    cron-scripted daily-crawl discipline; the streaming twin's slice
    layout applied to the batch path)."""
    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup_batched,
    )

    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    minhash_dedup_batched(base, state, **kw).count()

    def state_rows():
        import glob

        paths = [state + "/sig"] + [
            p
            for p in glob.glob(state + "/sig_admissions/admission=*")
            if not p.endswith("_cand")
        ]
        df = spark.read.parquet(*paths)
        return sorted(
            (r["_jid"], r["sig_0"], r["sig_1"]) for r in df.collect()
        )

    d1 = spark.createDataFrame(
        [(10, "one two three four five six seven"),
         (11, "one two three four five six seven")],
        "doc_id long, text string",
    )
    p1 = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_admit(
            d1, state, admission_id="2026-08-15", **kw
        ).collect()
    )
    assert p1 == [(10, 11, 1.0)]
    s1 = state_rows()

    # crashed-and-retried: the SAME admission replays — identical
    # pairs, identical state (no duplicate rows, sig/ untouched)
    p1_retry = sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in minhash_admit(
            d1, state, admission_id="2026-08-15", **kw
        ).collect()
    )
    assert p1_retry == p1
    assert state_rows() == s1
    assert spark.read.parquet(state + "/sig").count() == 1  # base only

    # the NEXT admission sees the committed slice as state
    d2 = spark.createDataFrame(
        [(20, "one two three four five six seven")],
        "doc_id long, text string",
    )
    p2 = {
        (r["id_a"], r["id_b"])
        for r in minhash_admit(
            d2, state, admission_id="2026-08-16", **kw
        ).collect()
    }
    assert p2 == {(10, 20), (11, 20)}

    # contract validation
    with pytest.raises(ValueError, match="admission_id"):
        minhash_admit(d2, state, admission_id="bad/slash", **kw)
    with pytest.raises(ValueError, match="_cand"):
        minhash_admit(d2, state, admission_id="x_cand", **kw)
    with pytest.raises(ValueError, match="mutually exclusive"):
        minhash_admit(
            d2, state, admission_id="a",
            delta_sig_path=str(tmp_path / "x"), **kw,
        )
    with pytest.raises(ValueError, match="update_state"):
        minhash_admit(
            d2, state, admission_id="a", update_state=False, **kw
        )


def test_minhash_admit_rejects_knob_mismatch(spark, tmp_path):
    """The state's baked hashing knobs are enforced: admission with
    different bands/hash_mode must raise, not return wrong pairs; a
    pre-metadata state (no minhash_meta.json) keeps the old contract."""
    import os

    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup_batched,
    )

    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    minhash_dedup_batched(base, state, **kw).count()
    delta = spark.createDataFrame(
        [(10, "one two three four")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="knob mismatch"):
        minhash_admit(
            delta, state, num_hashes=16, bands=4, shingle_k=3,
            threshold=0.5,
        )
    with pytest.raises(ValueError, match="hash_mode"):
        minhash_admit(delta, state, hash_mode="portable", **kw)
    # matching knobs pass; legacy meta-less state stays permissive
    assert minhash_admit(delta, state, update_state=False, **kw).count() == 0
    os.remove(os.path.join(state, "minhash_meta.json"))
    assert minhash_admit(
        delta, state, update_state=False, num_hashes=16, bands=4,
        shingle_k=3, threshold=0.5,
    ).count() == 0


def test_minhash_admit_bootstrap_writes_meta(spark, tmp_path):
    """An admission that CREATES the state freezes its knobs: the
    bootstrap call writes minhash_meta.json itself, so a later
    admission with different knobs raises instead of silently banding
    incomparable signatures together (review finding, round 8)."""
    import os

    from qualityassurancetool_spark.operators.dedup import minhash_admit

    state = str(tmp_path / "state")
    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    d1 = spark.createDataFrame(
        [(10, "one two three four five six seven")],
        "doc_id long, text string",
    )
    minhash_admit(d1, state, **kw).count()
    assert os.path.exists(os.path.join(state, "minhash_meta.json"))
    d2 = spark.createDataFrame(
        [(20, "eight nine ten eleven")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="knob mismatch"):
        minhash_admit(
            d2, state, num_hashes=16, bands=4, shingle_k=3, threshold=0.5
        )


def test_minhash_admit_frame_lifetime_and_scratch_cleanup(spark, tmp_path):
    """Each admission's pairs land in a FRESH versioned dir: the frame
    returned by admission N stays correct until admission N+1 runs,
    after which reading it fails LOUDLY (deleted path) instead of
    silently yielding N+1's pairs; internal scratch (_delta_sig, its
    _cand sibling, older pairs versions) never accumulates (review
    findings, round 8)."""
    import os

    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup_batched,
    )

    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    minhash_dedup_batched(base, state, **kw).count()

    d1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    r1 = minhash_admit(d1, state, **kw)
    assert {(r["id_a"], r["id_b"]) for r in r1.collect()} == {(0, 10)}

    d2 = spark.createDataFrame(
        [(20, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    r2 = minhash_admit(d2, state, **kw)
    assert {(r["id_a"], r["id_b"]) for r in r2.collect()} == {
        (0, 20), (10, 20)
    }
    # r1's backing files were deleted by admission 2 — a late read must
    # raise, not alias r2's pairs
    with pytest.raises(Exception):
        r1.collect()

    # scratch hygiene: one live pairs version, no delta/candidate data
    droot = os.path.join(state, "_delta_sig")
    if os.path.exists(droot):
        assert os.listdir(droot) == []
    versions = os.listdir(os.path.join(state, "_admit_pairs"))
    assert versions == ["v=1"]

    # FROZEN admissions get the same lifetime contract: their returned
    # frame reads versioned delta scratch that the next admission
    # deletes — never silently the newer delta's data
    d3 = spark.createDataFrame(
        [(30, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    r3 = minhash_admit(d3, state, update_state=False, **kw)
    assert {(r["id_a"], r["id_b"]) for r in r3.collect()} == {
        (0, 30), (10, 30), (20, 30)
    }
    d4 = spark.createDataFrame(
        [(40, "unrelated words entirely here")], "doc_id long, text string"
    )
    minhash_admit(d4, state, update_state=False, **kw).count()
    with pytest.raises(Exception):
        r3.collect()
    live = sorted(os.listdir(droot))
    # exactly one live version (the _cand_ids dir is round-10 scratch:
    # the frozen frame's semi-join reads it lazily, so it shares the
    # version lifetime)
    assert live == ["v=1", "v=1_cand", "v=1_cand_ids"]


def test_simhash_near_dup_pairs_banding_exact(spark, docs):
    """Banded simhash pairs == brute-force hamming<=k pairs (pigeonhole:
    max_hamming < bands makes the banding lossless), and the validation
    guards reject band/bit mismatches."""
    from qualityassurancetool_spark.operators.dedup import (
        simhash,
        simhash_near_dup_pairs,
    )

    sub = docs.limit(250)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dup_pairs(
            sub, bits=32, bands=4, max_hamming=3
        ).collect()
    }
    fp = sub.select(
        "doc_id", simhash(F.col("text"), 32).alias("fp")
    )
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.fp").bitwiseXOR(F.col("b.fp"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
        .collect()
    }
    assert got == brute and len(brute) > 0

    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(sub, bits=32, bands=5)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dup_pairs(sub, bits=32, bands=4, max_hamming=4)


def test_candidate_semi_join_sliced_path_is_exact(
    spark, docs, monkeypatch, tmp_path
):
    """When the exact candidate-id set exceeds the broadcast budget, the
    verify semi-filter splits the ids into hash slices and re-scans the
    corpus map-side per slice — the union must equal the plain
    broadcast semi-join (each id lives in exactly one slice).  Forced
    here by shrinking the budget so the batched pipeline takes the
    sliced path end-to-end and still matches the monolithic pairs."""
    import qualityassurancetool_spark.operators.dedup as dd

    sub = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(300)
    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    key = lambda df: {  # noqa: E731
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    }
    mono = key(dd.minhash_dedup(sub, **kw))
    monkeypatch.setattr(dd, "_BROADCAST_BYTES_LIMIT", 64)  # ~8 ids/slice
    got = key(
        dd.minhash_dedup_batched(
            sub, str(tmp_path / "sliced_semi"), band_batches=4, **kw
        )
    )
    assert got == mono and len(mono) > 0


def test_minhash_admit_slim_state_parity(spark, tmp_path):
    """Slim-state admission (round-11): a store_shingles=False work dir
    admits deltas when given corpus_text= — the state side's shingles
    recompute from the corpus text for candidate ids only, behind the
    same _candidate_semi_join discipline as the batched verify.  Pairs
    must be identical to full-storage admission; admission slices carry
    their own _sh so a SECOND admission pairs against the first without
    corpus_text covering it."""
    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup_batched,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(300)
        .select("doc_id", "text")
    )
    base = docs.where(F.col("doc_id") % 7 != 0)
    delta = docs.where(F.col("doc_id") % 7 == 0)
    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    full_dir = str(tmp_path / "full")
    slim_dir = str(tmp_path / "slim")
    minhash_dedup_batched(base, full_dir, **kw).count()
    minhash_dedup_batched(
        base, slim_dir, band_batches=16, store_shingles=False, **kw
    ).count()
    key = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    )
    p_full = key(minhash_admit(delta, full_dir, admission_id="d1", **kw))
    p_slim = key(
        minhash_admit(
            delta, slim_dir, admission_id="d1", corpus_text=base, **kw
        )
    )
    assert p_slim == p_full and len(p_full) > 0

    # retry the SAME admission id on the slim state: byte-identical
    p_retry = key(
        minhash_admit(
            delta, slim_dir, admission_id="d1", corpus_text=base, **kw
        )
    )
    assert p_retry == p_slim

    # second admission: d2 reuses texts from BOTH the first delta (its
    # shingles must come from the admission slice's _sh) and the base
    # corpus (recomputed from corpus_text); corpus_text also accepts a
    # parquet path, and a SUPERSET corpus (overlapping slice/delta
    # docs) must not double-count
    d1_rows = delta.limit(2).collect()
    b_rows = base.limit(2).collect()
    d2 = spark.createDataFrame(
        [(1_000_000 + i, r["text"]) for i, r in enumerate(d1_rows + b_rows)],
        "doc_id long, text string",
    )
    corpus_pq = str(tmp_path / "corpus_pq")
    docs.write.parquet(corpus_pq)  # superset: base + delta texts
    p2_full = key(minhash_admit(d2, full_dir, admission_id="d2", **kw))
    p2_slim = key(
        minhash_admit(
            d2, slim_dir, admission_id="d2", corpus_text=corpus_pq, **kw
        )
    )
    assert p2_slim == p2_full and len(p2_full) >= 4


def test_minhash_admit_slim_refusals_and_coverage(spark, tmp_path):
    """Slim-state admission guard rails: no corpus_text -> refuse with
    the corpus_text pointer; plain update_state append -> refuse (would
    fork the slim sig schema); corpus_text that misses a candidate's
    doc -> loud coverage error instead of silently dropped pairs."""
    from qualityassurancetool_spark.operators.dedup import (
        minhash_admit,
        minhash_dedup_batched,
    )

    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    base = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    minhash_dedup_batched(base, state, store_shingles=False, **kw).count()
    delta = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="corpus_text"):
        minhash_admit(delta, state, update_state=False, **kw)
    with pytest.raises(ValueError, match="admission_id"):
        minhash_admit(delta, state, corpus_text=base, **kw)
    unrelated = spark.createDataFrame(
        [(1, "totally different words here nothing shared")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="does not cover"):
        minhash_admit(
            delta, state, update_state=False, corpus_text=unrelated, **kw
        )
    # with the right corpus the same admission verifies at jaccard 1.0
    out = minhash_admit(
        delta, state, update_state=False, corpus_text=base, **kw
    ).collect()
    assert {(r["id_a"], r["id_b"], r["jaccard"]) for r in out} == {
        (0, 10, 1.0)
    }


def test_minhash_admit_band_pass_candidates_exact(
    spark, monkeypatch, tmp_path
):
    """Admission candidate join (round-11): when the delta's band
    entries exceed the broadcast budget, the bands split into passes
    whose delta entries each fit (never the AQE sort-merge fallback,
    which exchanges CORPUS-side band entries — the 100 M-doc rehearsal
    ENOSPC).  Forced here by shrinking the budget: pass-batched (and,
    tighter still, within-pass delta-hash-sliced) admissions must equal
    the single-pass pairs byte-for-byte, and the pass scratch must be
    gone afterwards."""
    import os

    import qualityassurancetool_spark.operators.dedup as dd

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(300)
        .select("doc_id", "text")
    )
    base = docs.where(F.col("doc_id") % 5 != 0)
    delta = docs.where(F.col("doc_id") % 5 == 0)
    kw = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.5)
    state = str(tmp_path / "state")
    dd.minhash_dedup_batched(base, state, **kw).count()
    key = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    )
    want = key(dd.minhash_admit(delta, state, update_state=False, **kw))
    assert len(want) > 0

    # ~2 bands per pass (60 delta docs x 64 B/entry = 3.8 KB per band)
    monkeypatch.setattr(dd, "_BROADCAST_BYTES_LIMIT", 8_192)
    got = key(dd.minhash_admit(delta, state, update_state=False, **kw))
    assert got == want

    # single-band passes + within-pass delta hash slices
    monkeypatch.setattr(dd, "_BROADCAST_BYTES_LIMIT", 2_048)
    got2 = key(dd.minhash_admit(delta, state, update_state=False, **kw))
    assert got2 == want

    # the per-pass scratch never outlives the call
    leftovers = [
        os.path.join(r, d)
        for r, ds, _ in os.walk(state)
        for d in ds
        if d.endswith("_cand_passes")
    ]
    assert leftovers == []
