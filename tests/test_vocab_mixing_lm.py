"""Vocabulary/OOV, deterministic corpus mixing, and char-LM scoring —
round-3 training-data operators.  DuckDB cross-engine oracles live in
tools/extra_oracles.py (x_vocab, x_mixing, x_lm_score); these tests pin
the semantics on hand-built fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.lm_score import (
    lm_filter,
    score_documents,
    train_char_lm,
)
from qualityassurancetool_spark.operators.mixing import (
    mix_corpora,
    mixture_report,
)
from qualityassurancetool_spark.operators.vocab import (
    oov_stats,
    token_vocabulary,
)


def test_token_vocabulary_counts_and_coverage(spark):
    df = spark.createDataFrame(
        [(1, "a b b c c c"), (2, "c a  a"), (3, "")], ["doc_id", "text"]
    )
    # counts: a=3, b=2, c=4  (empty doc contributes nothing)
    vocab = token_vocabulary(df, top_k=2)
    rows = {r["token"]: r for r in vocab.collect()}
    assert set(rows) == {"c", "a"}
    assert rows["c"]["n"] == 4 and rows["c"]["rank"] == 1
    assert rows["a"]["n"] == 3 and rows["a"]["rank"] == 2
    assert rows["c"]["coverage"] == pytest.approx(4 / 9)
    assert rows["a"]["coverage"] == pytest.approx(7 / 9)


def test_vocab_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "z y x w z y x w")], ["doc_id", "text"]
    )
    toks = [r["token"] for r in token_vocabulary(df, top_k=3).collect()]
    assert toks == ["w", "x", "y"]  # equal counts → lexicographic


def test_oov_stats(spark):
    df = spark.createDataFrame(
        [(1, "a b weird"), (2, "a a a"), (3, "")], ["doc_id", "text"]
    )
    vocab = spark.createDataFrame([("a",), ("b",)], ["token"])
    got = {r["doc_id"]: r for r in oov_stats(df, vocab).collect()}
    assert got[1]["n_tokens"] == 3 and got[1]["n_oov"] == 1
    assert got[1]["oov_rate"] == pytest.approx(1 / 3)
    assert got[2]["n_oov"] == 0
    assert 3 not in got  # empty doc yields no token rows


def _sources(spark):
    a = spark.createDataFrame(
        [(i, f"doc a{i}") for i in range(200)], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(i, f"doc b{i}") for i in range(100, 400)], ["doc_id", "text"]
    )
    return {"a": a, "b": b}


def test_mixture_epochs_and_fractions(spark):
    mix = mix_corpora(_sources(spark), {"a": 2.4, "b": 0.5})
    rep = {
        (r["source"], r["epoch"]): r["n_rows"]
        for r in mixture_report(mix).collect()
    }
    assert rep[("a", 0)] == 200 and rep[("a", 1)] == 200
    # fractional epochs: hash-sampled, ~frac of the source
    assert 0.25 * 200 <= rep[("a", 2)] <= 0.55 * 200
    assert 0.35 * 300 <= rep[("b", 0)] <= 0.65 * 300
    # determinism: identical mixture on a re-run, mix_key in [0, 1)
    again = mix_corpora(_sources(spark), {"a": 2.4, "b": 0.5})
    assert sorted(map(tuple, mix.collect())) == sorted(
        map(tuple, again.collect())
    )
    ks = [r["mix_key"] for r in mix.select("mix_key").collect()]
    assert all(0.0 <= k < 1.0 for k in ks)
    # distinct epochs of one source sample DIFFERENT fractional rows:
    # epoch salts differ, so mix keys differ per (source, epoch)
    k0 = {r["doc_id"] for r in mix.where(
        (F.col("source") == "a") & (F.col("epoch") == 2)).collect()}
    assert k0 != {r["doc_id"] for r in mix.where(
        (F.col("source") == "b") & (F.col("epoch") == 0)).collect()}


def test_mixture_validation_and_zero(spark):
    src = _sources(spark)
    with pytest.raises(ValueError, match="missing weights"):
        mix_corpora(src, {"a": 1.0})
    with pytest.raises(ValueError, match="negative"):
        mix_corpora(src, {"a": -0.1, "b": 1.0})
    empty = mix_corpora(src, {"a": 0.0, "b": 0.0})
    assert empty.count() == 0
    assert "mix_key" in empty.columns


FLUENT = [
    "the cat sat on the mat and the dog sat on the rug",
    "a cat and a dog sat near the door of the house",
    "the dog ran to the house and the cat ran to the mat",
] * 5


def test_lm_scores_rank_fluent_above_gibberish(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FLUENT)], ["doc_id", "text"]
    )
    lm = train_char_lm(ref)
    probe = spark.createDataFrame(
        [
            (1, "the cat sat near the door"),        # in-distribution
            (2, "zq xv jj qq wx zk vq jx qz xq"),    # gibberish
            (3, "ab"),                               # too short → floor
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in score_documents(probe, lm).collect()}
    assert got[1]["lm_logp"] > got[2]["lm_logp"]
    assert got[3]["n_grams"] == 0
    assert got[3]["lm_logp"] == pytest.approx(lm.floor_logp())
    assert got[1]["n_grams"] == len("the cat sat near the door") - 2
    # probabilities: every score is a log of something <= 1
    assert all(r["lm_logp"] < 0 for r in got.values())
    thresh = (got[1]["lm_logp"] + got[2]["lm_logp"]) / 2
    kept = lm_filter(probe, lm, min_logp=thresh)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_lm_unseen_context_floor(spark):
    ref = spark.createDataFrame([(1, "aaaa aaaa")], ["doc_id", "text"])
    lm = train_char_lm(ref)
    probe = spark.createDataFrame([(1, "zzzz")], ["doc_id", "text"])
    got = score_documents(probe, lm).collect()[0]
    # all trigrams unseen in unseen contexts → exactly the floor
    assert got["lm_logp"] == pytest.approx(math.log(1.0 / lm.alphabet))


def test_lm_threshold_for_quantile(spark):
    from qualityassurancetool_spark.operators.lm_score import (
        lm_threshold_for_quantile,
    )

    scores = spark.createDataFrame(
        [(i, -float(i)) for i in range(1, 11)], ["doc_id", "lm_logp"]
    )
    # keep best 30% of 10 docs → threshold at the 70th percentile of
    # score = -3.7 (interpolated); exactly 3 docs ≥ it
    t = lm_threshold_for_quantile(scores, 0.3)
    assert t == pytest.approx(-3.7)
    assert scores.where(F.col("lm_logp") >= t).count() == 3
    assert lm_threshold_for_quantile(scores, 1.0) == pytest.approx(-10.0)
    with pytest.raises(ValueError):
        lm_threshold_for_quantile(scores, 0.0)


def test_dedup_against_corpus(spark):
    from qualityassurancetool_spark.operators.dedup import (
        dedup_against_corpus,
        exact_dedup,
    )

    old = spark.createDataFrame(
        [(1, "the old doc"), (2, "another   OLD doc")], ["doc_id", "text"]
    )
    seen = exact_dedup(old).select("content_hash")
    new = spark.createDataFrame(
        [
            (10, "The Old Doc"),        # normalizes to a seen digest
            (11, "a brand new doc"),
            (12, "a  brand NEW doc"),   # within-batch dup of 11
            (13, "another fresh one"),
        ],
        ["doc_id", "text"],
    )
    out = dedup_against_corpus(new, seen)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [11, 13]
    assert "content_hash" in out.columns
    # idempotence: re-running against seen ∪ new-survivors drops all
    seen2 = seen.unionByName(out.select("content_hash"))
    assert dedup_against_corpus(new, seen2).count() == 0


def test_lm_perplexity_buckets(spark):
    """CCNet head/middle/tail: per-group tertiles on a constructed
    score sheet with obvious cut points."""
    import pytest
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.operators.lm_score import (
        lm_perplexity_buckets,
    )

    rows = [(i, "en", float(-i)) for i in range(9)]  # -0 best ... -8 worst
    rows += [(100 + i, "de", float(-10 * i)) for i in range(3)]
    scores = spark.createDataFrame(
        rows, "doc_id long, lang string, lm_logp double"
    )
    out = {r["doc_id"]: r["lm_bucket"] for r in lm_perplexity_buckets(
        scores, group_col="lang"
    ).collect()}
    # en: 9 docs, thirds at interpolated q(2/3) and q(1/3)
    assert [out[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    # de: 3 docs, one per bucket
    assert [out[100 + i] for i in range(3)] == ["head", "middle", "tail"]
    # grouped=None crosses the whole sheet
    glob = lm_perplexity_buckets(scores, group_col=None)
    assert glob.where(F.col("lm_bucket") == "head").count() > 0
    with pytest.raises(ValueError):
        lm_perplexity_buckets(scores, cuts=(0.9, 0.1))


def test_temperature_weights_properties():
    """XLM/mT5 temperature sampling: alpha=1 reproduces natural
    proportions (every domain exactly 1 epoch at the natural budget);
    alpha=0 gives every domain an equal share of the budget; lower
    alpha upsamples the small domain monotonically; max_epochs caps."""
    import pytest

    from qualityassurancetool_spark.operators.mixing import (
        temperature_weights,
    )

    sizes = {"big": 90_000, "mid": 9_000, "small": 1_000}
    natural = temperature_weights(sizes, alpha=1.0)
    assert all(w == pytest.approx(1.0) for w in natural.values())
    uniform = temperature_weights(sizes, alpha=0.0)
    # equal share of the 100k budget: each domain contributes ~33.3k
    for k, n in sizes.items():
        assert uniform[k] * n == pytest.approx(100_000 / 3)
    w07 = temperature_weights(sizes, alpha=0.7)
    w03 = temperature_weights(sizes, alpha=0.3)
    assert w03["small"] > w07["small"] > natural["small"]
    assert w03["big"] < w07["big"] < natural["big"] + 1e-9
    # the budget is conserved (no cap): sum of epochs*size == target
    for w in (natural, uniform, w07, w03):
        assert sum(w[k] * sizes[k] for k in sizes) == pytest.approx(
            100_000
        )
    capped = temperature_weights(sizes, alpha=0.0, max_epochs=5.0)
    assert capped["small"] == 5.0
    # clipped mass NOT redistributed — under budget, transparently
    assert sum(capped[k] * sizes[k] for k in sizes) < 100_000
    with pytest.raises(ValueError, match="positive"):
        temperature_weights({"a": 0})
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(sizes, alpha=-1)


def test_temperature_mixture_end_to_end(spark):
    """temperature_mixture drives mix_corpora: per-source row counts of
    the materialized mixture track p_d * budget within hash-sampling
    tolerance, and the mixture is deterministic."""
    import pytest

    from qualityassurancetool_spark.operators.mixing import (
        temperature_mixture,
        temperature_weights,
    )

    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    small = spark.range(200).select((F.col("id") + 10_000).alias("doc_id"))
    sources = {"big": big, "small": small}
    mix = temperature_mixture(sources, alpha=0.3)
    counts = {
        r["source"]: r["n"]
        for r in mix.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    w = temperature_weights({"big": 5000, "small": 200}, alpha=0.3)
    assert counts["small"] == pytest.approx(w["small"] * 200, rel=0.12)
    assert counts["big"] == pytest.approx(w["big"] * 5000, rel=0.05)
    # small domain upsampled past one epoch
    assert counts["small"] > 200
    # determinism: same inputs -> identical mixture
    again = temperature_mixture(sources, alpha=0.3)
    assert sorted(map(tuple, mix.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_unimax_weights_properties():
    """UniMax (Chung et al. 2023): equal budget shares unless capped;
    capped domains take exactly max_epochs; unused share redistributed
    (budget conserved whenever B <= N * total); N=1 at the natural
    budget gives exactly one epoch everywhere; monotone in N."""
    import pytest

    from qualityassurancetool_spark.operators.mixing import unimax_weights

    sizes = {"big": 90_000, "mid": 9_000, "small": 1_000}

    # nobody capped (cap far above the uniform share): equal budgets
    w = unimax_weights(sizes, max_epochs=1000.0)
    for k, n in sizes.items():
        assert w[k] * n == pytest.approx(100_000 / 3)

    # tight cap: small+mid take N epochs, big absorbs the remainder
    w2 = unimax_weights(sizes, max_epochs=2.0)
    assert w2["small"] == pytest.approx(2.0)
    assert w2["mid"] == pytest.approx(2.0)
    assert w2["big"] * 90_000 == pytest.approx(100_000 - 2 * 10_000)
    # budget conserved exactly when achievable
    assert sum(w2[k] * sizes[k] for k in sizes) == pytest.approx(100_000)

    # infeasible budget (B > N * total): everyone hits the cap
    w3 = unimax_weights(sizes, target_total=500_000, max_epochs=2.0)
    assert all(v == pytest.approx(2.0) for v in w3.values())

    # N=1 at the natural budget: exactly one epoch each
    w4 = unimax_weights(sizes, max_epochs=1.0)
    assert all(v == pytest.approx(1.0) for v in w4.values())

    # raising N never lowers a small domain's epochs
    e2 = unimax_weights(sizes, max_epochs=2.0)["small"]
    e4 = unimax_weights(sizes, max_epochs=4.0)["small"]
    assert e4 >= e2

    with pytest.raises(ValueError, match="positive"):
        unimax_weights({"a": -1})
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_weights(sizes, max_epochs=0)
    with pytest.raises(ValueError, match="non-empty"):
        unimax_weights({})


def test_unimax_mixture_end_to_end(spark):
    """unimax_mixture: the small source is upsampled to its epoch cap,
    the big source absorbs the rest, and the build is deterministic."""
    import pytest

    from qualityassurancetool_spark.operators.mixing import (
        unimax_mixture,
        unimax_weights,
    )

    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    small = spark.range(200).select((F.col("id") + 10_000).alias("doc_id"))
    sources = {"big": big, "small": small}
    mix = unimax_mixture(sources, max_epochs=3.0)
    counts = {
        r["source"]: r["n"]
        for r in mix.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    w = unimax_weights({"big": 5000, "small": 200}, max_epochs=3.0)
    assert w["small"] == pytest.approx(3.0)  # capped
    assert counts["small"] == 600  # 3 integral epochs, no sampling noise
    assert counts["big"] == pytest.approx(w["big"] * 5000, rel=0.05)
    again = unimax_mixture(sources, max_epochs=3.0)
    assert sorted(map(tuple, mix.collect())) == sorted(
        map(tuple, again.collect())
    )
