"""Property-based tests (hypothesis) for the MinHash execution
variants: the batched schedule and incremental admission must emit the
monolithic pipeline's pairs EXACTLY on randomized corpora — the fixed
parity fixtures in test_scale_ops.py pin known shapes; these hunt the
shapes nobody thought to pin (empty deltas, all-duplicate corpora,
single-token docs, bands that never collide)."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qualityassurancetool_spark.operators.dedup import (
    minhash_admit,
    minhash_dedup,
    minhash_dedup_batched,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary so random docs actually collide into near-dups
WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
KW = dict(num_hashes=8, bands=4, shingle_k=2, threshold=0.3)

doc_texts = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=2, max_size=8).map(" ".join),
    min_size=2,
    max_size=12,
)


def _pairs_key(df):
    return {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in df.collect()
    }


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@SLOW
@given(texts=doc_texts, band_batches=st.sampled_from([1, 2, 4]))
def test_batched_schedule_matches_monolithic(spark, texts, band_batches):
    docs = _corpus(spark, texts)
    want = _pairs_key(minhash_dedup(docs, **KW))
    work = tempfile.mkdtemp(prefix="mh_prop_")
    try:
        got = _pairs_key(
            minhash_dedup_batched(
                docs, work, band_batches=band_batches, **KW
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    assert got == want


@SLOW
@given(texts=doc_texts)
def test_admission_matches_restricted_monolithic(spark, texts):
    """minhash_admit(delta, state_of(base)) == monolithic pairs over
    (base UNION delta) restricted to pairs touching a delta doc — for a
    RANDOM split, including empty base / empty-pair outcomes."""
    docs = _corpus(spark, texts)
    delta = docs.where((docs.doc_id % 3) == 0)
    base = docs.where((docs.doc_id % 3) != 0)
    delta_ids = set(range(0, len(texts), 3))
    want = {
        p
        for p in _pairs_key(minhash_dedup(docs, **KW))
        if p[0] in delta_ids or p[1] in delta_ids
    }
    state = tempfile.mkdtemp(prefix="mh_prop_state_")
    try:
        if base.count():
            minhash_dedup_batched(base, state, **KW).count()
        got = _pairs_key(minhash_admit(delta, state, **KW))
    finally:
        shutil.rmtree(state, ignore_errors=True)
    assert got == want
