"""Property-based laws for the second round-3 operator batch:
idempotence (redaction, URL canonicalization, span dedup), the
winnowing guarantee on generated inputs, and E-S sample nesting."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORD = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=2, max_size=8)
TEXTS = st.lists(
    st.lists(WORD, min_size=0, max_size=40).map(" ".join),
    min_size=1,
    max_size=6,
)


@SLOW
@given(texts=TEXTS)
def test_redaction_idempotent(spark, texts):
    """redact(redact(x)) == redact(x): placeholders contain no PII."""
    from qualityassurancetool_spark.operators.quality_filters import (
        redact_pii,
    )

    spiked = [
        t + " a@b.co 10.0.0.1 +32 2 123 45 67" if i % 2 else t
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(spiked)], "doc_id long, text string"
    )
    once = df.select(
        "doc_id", redact_pii(F.col("text")).alias("text")
    )
    twice = once.select(
        "doc_id", redact_pii(F.col("text")).alias("text")
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@SLOW
@given(
    hosts=st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=2, max_size=8),
        min_size=1,
        max_size=5,
    ),
    params=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "utm_x", "gclid", "z"]),
            st.integers(0, 9),
        ),
        max_size=4,
    ),
)
def test_url_canonicalization_idempotent(spark, hosts, params):
    from qualityassurancetool_spark.operators.urls import canonicalize_url

    q = "&".join(f"{k}={v}" for k, v in params)
    urls = [
        f"HTTPS://WWW.{h}.example.COM:443/P/{i}/" + (f"?{q}#f" if q else "")
        for i, h in enumerate(hosts)
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i long, url string"
    )
    once = df.select("i", canonicalize_url(F.col("url")).alias("url"))
    twice = once.select("i", canonicalize_url(F.col("url")).alias("url"))
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@SLOW
@given(texts=TEXTS, seed=st.integers(0, 100))
def test_span_dedup_idempotent(spark, texts, seed):
    """A second pass over deduped output removes nothing: the survivor
    set contains each duplicated window at most once (the kept first
    occurrence)."""
    from qualityassurancetool_spark.operators.span_dedup import (
        duplicated_span_dedup,
    )

    # plant duplication: replicate the first text at the end
    rows = [(i, t) for i, t in enumerate(texts)] + [
        (1000, texts[0]), (1001, texts[0] + " " + texts[0])
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = duplicated_span_dedup(df, window_tokens=4)
    again = duplicated_span_dedup(
        once.select(F.col("doc_id"), F.col("deduped").alias("text")),
        window_tokens=4,
    )
    assert again.agg(F.sum("n_tokens_removed")).collect()[0][0] in (0, None)


@SLOW
@given(
    n=st.integers(10, 60),
    k1=st.integers(1, 5),
    extra=st.integers(1, 5),
)
def test_weighted_sample_nesting(spark, n, k1, extra):
    """E-S top-k is an order statistic: the top-k1 sample is a strict
    prefix of the top-(k1+extra) sample under the same salt."""
    from qualityassurancetool_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(i, float(1 + i % 7)) for i in range(n)], "doc_id long, w double"
    )
    small = {
        r["doc_id"]: r["sample_rank"]
        for r in weighted_sample_topk(df, k1, "w").collect()
    }
    big = {
        r["doc_id"]: r["sample_rank"]
        for r in weighted_sample_topk(df, k1 + extra, "w").collect()
    }
    for i, rk in small.items():
        assert big[i] == rk


@SLOW
@given(
    words=st.lists(WORD, min_size=3, max_size=12, unique=True),
    reps=st.lists(st.integers(1, 6), min_size=3, max_size=12),
    seed=st.integers(0, 99),
)
def test_bpe_order_invariance_and_reconstruction(spark, words, reps, seed):
    """Merges depend only on the word MULTISET (the count agg is
    order-free), and encoding always reconstructs the characters."""
    import random

    from qualityassurancetool_spark.operators.bpe import (
        EOW,
        bpe_encode,
        bpe_train,
    )

    bag = [w for w, r in zip(words, reps) for _ in range(r)]
    rng = random.Random(seed)
    docs1 = [(i, " ".join(bag[i::3])) for i in range(3)]
    shuffled = bag[:]
    rng.shuffle(shuffled)
    docs2 = [(i, " ".join(shuffled[i::3])) for i in range(3)]
    df1 = spark.createDataFrame(docs1, "doc_id long, text string")
    df2 = spark.createDataFrame(docs2, "doc_id long, text string")
    m1, m2 = bpe_train(df1, n_merges=20), bpe_train(df2, n_merges=20)
    assert m1 == m2
    for r in bpe_encode(df1, m1).collect():
        rebuilt = "".join(r["tokens"]).replace(EOW, " ").strip()
        orig = dict(docs1)[r["doc_id"]]
        assert rebuilt == " ".join(orig.split())
