"""Unicode normalization for text corpora: NFC/NFKC canonicalization
(the standard first step before tokenization/hashing — composed vs
decomposed accents otherwise break exact dedup, vocab counts, and
every md5-keyed operator) plus control-character stripping.

Spark has no built-in Unicode-normalization expression, so this is one
of the few sanctioned Python kernels (the multimodal/geo exception
class): an Arrow-batched ``pandas_udf`` over the text column only —
row-local, zero shuffle, no join.  Control-char stripping IS
expressible as a Column (regexp) and stays JVM-side.

Cross-engine check: DuckDB ships ``nfc_normalize`` — the NFC path is
oracle-checked end-to-end on accent-augmented docs
(``tools/extra_oracles.py::x_unicode_nfc``); NFKC (no DuckDB twin) is
pinned by planted-example tests against CPython's unicodedata, which
implements the published Unicode tables.

Reference scope note: beyond-reference training-data family
(SURVEY §2b/2c).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FORMS = ("NFC", "NFD", "NFKC", "NFKD")

# C0/C1 control blocks minus \t \n \r (which are structure, not noise)
_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]"


def strip_control_chars(text: Column) -> Column:
    """Drop C0/C1 control characters (keeping tab/newline/CR) — pure
    Column, JVM-side."""
    return F.regexp_replace(text, _CONTROL_RE, "")


def unicode_normalize_udf(form: str = "NFC"):
    """Arrow-batched normalization kernel for ``form`` (NFC/NFD/NFKC/
    NFKD).  Returns a pandas_udf usable as a Column function."""
    if form not in FORMS:
        raise ValueError(f"form must be one of {FORMS}, got {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if x is not None
            else None
        )

    return _norm


def normalize_documents(
    df: DataFrame,
    form: str = "NFC",
    text_col: str = "text",
    strip_controls: bool = True,
) -> DataFrame:
    """Rewrite ``text_col`` to its ``form``-normalized (and optionally
    control-stripped) version, all other columns untouched.  Row-local:
    one Arrow round trip over the text column only."""
    norm = unicode_normalize_udf(form)(F.col(text_col))
    if strip_controls:
        norm = strip_control_chars(norm)
    return df.withColumn(text_col, norm)
