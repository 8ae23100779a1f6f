"""HTML → text extraction with boilerplate block filtering.

Web corpora arrive as HTML; every C4/RefinedWeb-style pipeline starts
by extracting main text and dropping navigation/boilerplate.  This is
the jusText/boilerpipe family idea (public literature: Pomikálek 2011)
reduced to its load-bearing core, implemented on the stdlib
``html.parser`` so the container stays dependency-free (the swap point
for trafilatura/resiliparse is the kernel function, same contract as
the multimodal codec seams):

 - ``script``/``style``/``noscript``/``template``/``svg`` subtrees and
   comments are dropped outright;
 - text is segmented into BLOCKS at block-level element boundaries
   (p, div, li, h1-h6, td, article, section, br, …);
 - per block, the LINK DENSITY (characters inside ``<a>`` / total
   characters) and length decide boilerplate: short and link-dense →
   navigation/footer → dropped;
 - kept blocks join with blank lines; entities are unescaped by the
   parser (``convert_charrefs``).

Spark shape: one Arrow-batched ``mapInPandas`` over (html) — row-local,
no shuffle, the sanctioned-Python-kernel pattern (HTML parsing has no
Column expression).  No SQL oracle (DuckDB cannot parse HTML); the
pytest gate uses golden fixtures covering nav menus, malformed markup,
entities, and nesting (`tests/test_html_extract.py`).
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SKIP_SUBTREES = {"script", "style", "noscript", "template", "svg", "head"}
_BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "th", "tr", "table", "article", "section", "header", "footer",
    "nav", "aside", "main", "blockquote", "pre", "br", "hr", "form",
    "figure", "figcaption", "details", "summary",
}


class _BlockParser(HTMLParser):
    """Collects (text, link_chars, total_chars) per block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._skip_depth = 0
        self._link_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, self._link_chars, self._total_chars))
        self._parts = []
        self._link_chars = 0
        self._total_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._parts.append(data)
        n = len(data.strip())
        self._total_chars += n
        if self._link_depth:
            self._link_chars += n

    def close(self):
        super().close()
        self._flush()


def extract_blocks(
    html: str,
    max_link_density: float = 0.5,
    min_block_chars: int = 25,
) -> tuple[str, int, int]:
    """(text, n_blocks_kept, n_blocks_dropped) for one document.  A
    block survives only when it is BOTH long enough
    (``min_block_chars``) AND link-sparse (``max_link_density``):
    short runs are navigation/chrome regardless of links, and
    link-dense runs are menus regardless of length — both conditions
    must hold, which is the jusText "good block" core."""
    p = _BlockParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        # malformed beyond the parser's tolerance: salvage nothing
        # rather than half a tree — callers see an empty doc to filter
        return "", 0, 0
    kept, dropped = [], 0
    for text, link_chars, total_chars in p.blocks:
        density = link_chars / total_chars if total_chars else 1.0
        if len(text) >= min_block_chars and density <= max_link_density:
            kept.append(text)
        else:
            dropped += 1
    return "\n\n".join(kept), len(kept), dropped


def extract_documents(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    max_link_density: float = 0.5,
    min_block_chars: int = 25,
) -> DataFrame:
    """Input columns (minus ``html_col``) + ``out_col``,
    ``n_blocks``, ``n_boilerplate_blocks`` — the extraction front end
    of the curation pipeline.  Row-local Arrow kernel; no shuffle."""
    keep_fields = [f for f in df.schema.fields if f.name != html_col]
    out_schema = StructType(
        keep_fields
        + [
            StructField(out_col, StringType()),
            StructField("n_blocks", IntegerType()),
            StructField("n_boilerplate_blocks", IntegerType()),
        ]
    )
    keep_names = [f.name for f in keep_fields]

    def kernel(batches):
        for pdf in batches:
            res = pdf[html_col].map(
                lambda h: extract_blocks(
                    h, max_link_density, min_block_chars
                )
            )
            out = pdf[keep_names].copy()
            out[out_col] = [r[0] for r in res]
            out["n_blocks"] = [r[1] for r in res]
            out["n_boilerplate_blocks"] = [r[2] for r in res]
            yield out

    return df.mapInPandas(kernel, out_schema)
