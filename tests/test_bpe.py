"""BPE tokenizer induction + encoding (operators/bpe)."""

from __future__ import annotations

from qualityassurancetool_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    bpe_train_from_counts,
    encode_word,
)


def test_merge_loop_known_corpus():
    """The textbook example: frequent pairs merge first, deterministic
    tie-breaks."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe_train_from_counts(counts, n_merges=4)
    # 'es' (newest 6 + widest 3 = 9) is the most frequent first pair
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert "".join(encode_word("newest", ranks)).endswith("est" + EOW)


def test_train_encode_roundtrip_properties(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the fat cat ate the rat"),
        (3, "mat rat cat " * 10),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_train(df, n_merges=30)
    assert merges == bpe_train(df, n_merges=30)  # deterministic
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    for i, text in docs:
        # every word ends with exactly one EOW-terminated token,
        # and concatenating tokens reconstructs the characters
        joined = "".join(out[i]["tokens"]).replace(EOW, " ").strip()
        norm = " ".join(text.lower().split())
        assert joined == norm
        assert out[i]["n_words"] == len(norm.split())
        # compression: frequent words become single tokens
        assert out[i]["n_bpe_tokens"] <= sum(
            len(w) + 1 for w in norm.split()
        )
    # 'the' and 'cat' are frequent enough to be single tokens
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert encode_word("cat", ranks) == ["cat" + EOW]


def test_empty_and_unseen(spark):
    df = spark.createDataFrame(
        [(1, "aa aa aa"), (2, "")], "doc_id long, text string"
    )
    merges = bpe_train(df, n_merges=5)
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    assert out[2]["n_words"] == 0 and out[2]["tokens"] == []
    # unseen word falls back to char pieces, never crashes
    unseen = spark.createDataFrame([(9, "zqxj")], "doc_id long, text string")
    row = bpe_encode(unseen, merges).collect()[0]
    assert "".join(row["tokens"]) == "zqxj" + EOW
