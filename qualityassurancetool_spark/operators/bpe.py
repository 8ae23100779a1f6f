"""BPE tokenizer induction and encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Real BPE trainers (subword-nmt, sentencepiece) do NOT scan the corpus
per merge — they aggregate the corpus into a word-frequency dict once
and run the merge loop over that dict.  That maps exactly onto Spark:

 1. ONE distributed word-count aggregation (map-side combined, shuffle
    of (word, count) pairs), capped at the ``max_words`` most frequent
    words — the standard trainer bound: the dropped tail is covered by
    character fallback, and the cap bounds driver memory exactly like
    the IVF-centroid / classifier-bucket collects;
 2. the classic merge loop on the driver over the (small) dict:
    count symbol pairs weighted by word frequency, merge the most
    frequent pair (ties broken lexicographically — deterministic),
    ``n_merges`` times.  O(n_merges x distinct-words) — milliseconds
    at trainer scale, no cluster involvement;
 3. encoding applies the ordered merge list per word — inherently a
    per-word loop, so it is the sanctioned Arrow ``mapInPandas``
    kernel, with a per-batch word cache (Zipf makes the cache hit rate
    ~token/type ratio).

End-of-word marker ``</w>`` follows subword-nmt.  Everything is
deterministic: same corpus → same merges → same encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.hashing import normalize_text

EOW = "</w>"


def word_counts(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, int]]:
    """(word, count) for the ``max_words`` most frequent words —
    deterministic order (count desc, word asc)."""
    counts = (
        df.select(normalize_text(F.col(text_col)).alias("_norm"))
        .where(F.length("_norm") > 0)
        .select(F.explode(F.split(F.col("_norm"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["n"]) for r in counts]


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    pairs: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + n
    return pairs


def _apply_merge(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i = 0
    while i < len(syms):
        if (
            i < len(syms) - 1
            and syms[i] == pair[0]
            and syms[i + 1] == pair[1]
        ):
            out.append(pair[0] + pair[1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train_from_counts(
    counts: list[tuple[str, int]], n_merges: int = 200
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency dict.  Returns the
    ordered merge list.  Deterministic: most-frequent pair wins, ties
    broken by lexicographic pair order."""
    vocab = {
        tuple(list(w) + [EOW]): n for w, n in counts if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {
            _apply_merge(syms, best): n for syms, n in vocab.items()
        }
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Corpus → ordered BPE merges (one aggregation + driver loop)."""
    return bpe_train_from_counts(
        word_counts(df, text_col, max_words), n_merges
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, best-rank-first (the standard greedy
    BPE encode)."""
    syms = tuple(list(word) + [EOW])
    while len(syms) > 1:
        candidates = [
            (ranks[p], p)
            for p in zip(syms, syms[1:])
            if p in ranks
        ]
        if not candidates:
            break
        _, best = min(candidates)
        syms = _apply_merge(syms, best)
    return list(syms)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens, tokens): subword encoding of every
    document with a trained merge list.  Arrow-batched ``mapInPandas``
    with a per-batch word→encoding cache (Zipf: the cache converts the
    per-word loop into roughly one encode per TYPE, not per token)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = (
        f"{id_col} long, n_words long, n_bpe_tokens long, "
        "tokens array<string>"
    )
    slim = df.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("_norm")
    )

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_w, n_t, toks = [], [], [], []
            for did, norm in zip(pdf[id_col], pdf["_norm"]):
                words = norm.split(" ") if norm else []
                enc: list[str] = []
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        cache[w] = got
                    enc.extend(got)
                ids.append(did)
                n_w.append(len(words))
                n_t.append(len(enc))
                toks.append(enc)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_words": n_w,
                    "n_bpe_tokens": n_t,
                    "tokens": toks,
                }
            )

    return slim.mapInPandas(run, schema=out_schema)
