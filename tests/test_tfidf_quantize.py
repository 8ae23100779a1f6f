"""TF-IDF (operators/tfidf) and int8 quantization
(operators/similarity) unit tests."""

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.similarity import (
    cosine_similarity,
    dequantize_int8,
    quantize_int8,
)
from qualityassurancetool_spark.operators.tfidf import (
    term_frequencies,
    tfidf,
    top_terms_per_doc,
)

DOCS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry cherry cherry date"),
]


def test_term_frequencies_exact(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_frequencies(docs).collect()
    }
    assert got == {
        (1, "apple"): 2,
        (1, "banana"): 1,
        (2, "banana"): 1,
        (2, "cherry"): 1,
        (3, "cherry"): 3,
        (3, "date"): 1,
    }


def test_tfidf_values_match_hand_computation(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["term"]): (r["df"], r["tfidf"])
        for r in tfidf(docs).collect()
    }

    def w(tf, df):
        return tf * (math.log(4.0 / (df + 1)) + 1.0)

    assert got[(1, "apple")] == (1, pytest.approx(w(2, 1)))
    assert got[(1, "banana")] == (2, pytest.approx(w(1, 2)))
    assert got[(3, "cherry")] == (2, pytest.approx(w(3, 2)))
    assert got[(3, "date")] == (1, pytest.approx(w(1, 1)))


def test_top_terms_rank_and_tiebreak(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = top_terms_per_doc(docs, k=1).collect()
    best = {r["doc_id"]: r["term"] for r in rows}
    # doc 1: apple (tf 2, df 1) beats banana; doc 3: cherry (tf 3)
    assert best[1] == "apple"
    assert best[3] == "cherry"
    assert all(r["rank"] == 1 for r in rows)


def test_min_df_filters_rare_terms(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    terms = {r["term"] for r in tfidf(docs, min_df=2).collect()}
    assert terms == {"banana", "cherry"}


VECS = [
    (1, [1.0, -2.0, 3.5]),
    (2, [0.0, 0.0, 0.0]),
    (3, [-127.0, 127.0, 1.0]),
    (4, [1e-8, -1e-8, 1e-8]),
]


def test_quantize_roundtrip_error_bound(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"])
    q = quantize_int8(df)
    out = q.withColumn(
        "deq", dequantize_int8(F.col("qvec"), F.col("qscale"))
    ).collect()
    for r in out:
        s = r["qscale"]
        assert all(-127 <= c <= 127 for c in r["qvec"])
        for orig, deq in zip(r["embedding"], r["deq"]):
            assert abs(orig - deq) <= s / 2 + 1e-12
    zero = next(r for r in out if r["vec_id"] == 2)
    assert zero["qscale"] == 0.0 and zero["deq"] == [0.0, 0.0, 0.0]


def test_quantize_preserves_cosine(spark):
    import random

    rng = random.Random(5)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(20)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = quantize_int8(df).withColumn(
        "deq", dequantize_int8(F.col("qvec"), F.col("qscale"))
    )
    rows = (
        q.alias("a")
        .join(q.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            cosine_similarity(
                F.col("a.embedding"), F.col("b.embedding")
            ).alias("c_full"),
            cosine_similarity(F.col("a.deq"), F.col("b.deq")).alias(
                "c_q"
            ),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert r["c_q"] == pytest.approx(r["c_full"], abs=2e-2)


def test_url_domain_signals(spark):
    from qualityassurancetool_spark.operators.quality_filters import (
        domain_blocklist_hit,
        extract_domains,
        url_count,
    )

    docs = spark.createDataFrame(
        [
            (1, "see https://www.example.com/page and http://spam.bad.site/x?q=1"),
            (2, "no links here"),
            (3, "dup https://a.io https://a.io and https://sub.a.io/path"),
        ],
        ["doc_id", "text"],
    )
    low = F.lower(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            url_count(low).alias("n_urls"),
            extract_domains(low).alias("doms"),
            domain_blocklist_hit(low, ["bad.site"]).alias("blocked"),
            domain_blocklist_hit(low, ["a.io"]).alias("blocked_a"),
        ).collect()
    }
    assert out[1]["n_urls"] == 2
    assert sorted(out[1]["doms"]) == ["example.com", "spam.bad.site"]
    assert out[1]["blocked"] is True          # subdomain suffix match
    assert out[2]["n_urls"] == 0 and out[2]["blocked"] is False
    assert sorted(out[3]["doms"]) == ["a.io", "sub.a.io"]
    assert out[3]["blocked_a"] is True
    assert out[3]["blocked"] is False


def test_tfidf_matches_duckdb_oracle(spark):
    """Cross-engine oracle for the operator that has no driver query
    slot: identical tf/df/weight on a generated corpus in DuckDB."""
    import duckdb
    import random

    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12))))
        for i in range(40)
    ]
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    from qualityassurancetool_spark.operators.tfidf import tfidf

    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["df"], round(r["tfidf"], 9))
        for r in tfidf(sdf).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    want_rows = con.execute("""
        WITH tf AS (
            SELECT doc_id, t.term, COUNT(*) AS tf
            FROM docs, UNNEST(string_split(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g')), ' ')) AS t(term)
            WHERE t.term <> ''
            GROUP BY doc_id, t.term
        ), df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        )
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * (ln((SELECT COUNT(*)+1 FROM docs)::DOUBLE/(df.df+1)) + 1)
        FROM tf JOIN df USING (term)
    """).fetchall()
    want = {
        (d, t): (tf_, df_, round(w, 9)) for d, t, tf_, df_, w in want_rows
    }
    assert got == want


def test_intra_doc_dedup(spark):
    from qualityassurancetool_spark.operators.quality_filters import (
        dedup_lines,
        dedup_paragraphs,
    )

    docs = spark.createDataFrame(
        [
            (1, "header\n\nbody one\n\nheader\n\nbody two\n\nheader"),
            (2, "a\nb\na\nc\nb"),
            (3, "only once"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["p"], r["l"])
        for r in docs.select(
            "doc_id",
            dedup_paragraphs(F.col("text")).alias("p"),
            dedup_lines(F.col("text")).alias("l"),
        ).collect()
    }
    assert got[1][0] == "header\n\nbody one\n\nbody two"
    assert got[2][1] == "a\nb\nc"
    assert got[3] == ("only once", "only once")
