"""URL canonicalization and canonical-URL dedup for crawl corpora.

Crawl snapshots reach a pipeline with the same page under many spellings
— scheme/host case, ``www.`` prefixes, default ports, fragments,
tracking parameters, trailing slashes, shuffled query order.  Exact
dedup on the raw string misses all of them; canonicalizing first turns
URL dedup into the same one-shuffle hash-groupBy as content dedup
(operators/dedup.py exact_dedup).

Canonical form (every step a pure Column; DuckDB renders the identical
logic for the oracle):

 1. lowercase scheme and authority (path/query case is significant);
 2. drop a leading ``www.``;
 3. drop default ports (``:80`` for http, ``:443`` for https);
 4. drop the fragment (``#…`` — client-side only);
 5. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``,
    ``msclkid``, ``ref``) and SORT the surviving query parameters
    (order is almost never semantic; sorting makes equal param sets
    compare equal);
 6. drop a trailing slash on a non-root path; empty path becomes ``/``.

All steps are row-local regexp/array expressions — no shuffle, no
Python, whole-stage codegen.  The dedup is one groupBy on the canonical
string (or its md5 at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHEME_PAT = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
AUTH_PAT = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
TRACKING_PARAM_PAT = r"^(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|ref)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL (see module docstring).  Inputs
    without a ``scheme://`` are returned trimmed-lowercase as-is (not
    parseable as a URL; canonicalizing garbage would manufacture
    collisions)."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, SCHEME_PAT, 1))
    auth = F.lower(F.regexp_extract(u, AUTH_PAT, 1))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.regexp_replace(auth, ":80$", ""),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.regexp_replace(auth, ":443$", ""),
    ).otherwise(auth)

    # everything after the authority, fragment stripped
    rest = F.regexp_replace(u, AUTH_PAT, "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)

    path = F.when(path == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path) > 1) & path.endswith("/"),
            F.regexp_replace(path, "/$", ""),
        ).otherwise(path)
    )

    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PAT),
    )
    q_norm = F.array_join(F.array_sort(params), "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(q_norm != "", F.concat(F.lit("?"), q_norm)).otherwise(
            F.lit("")
        ),
    )
    return F.when(scheme == "", F.lower(u)).otherwise(canon)


def dedup_by_canonical_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per canonical URL: (canonical_url, keep_id,
    n_dups) — the exact_dedup shape, one shuffle on the canonical
    string.  At 100 TB group on ``md5(canonical)`` instead to bound the
    shuffle key width (same swap as content dedup)."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
