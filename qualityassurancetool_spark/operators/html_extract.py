"""HTML → text extraction with boilerplate block filtering.

Web corpora arrive as HTML; every C4/RefinedWeb-style pipeline starts
by extracting main text and dropping navigation/boilerplate.  This is
the jusText/boilerpipe family (public literature: Pomikálek 2011) on
the stdlib ``html.parser`` so the container stays dependency-free.
Three engines share one kernel contract (``extract_documents(...,
engine=)``): ``core`` — the load-bearing length+link-density filter;
``justext`` — the FULL context-sensitive jusText classification
(stopword density, short/neargood revision by neighborhood, heading
promotion) for better recall on headings/captions inside good content;
``trafilatura`` — the optional external library, import-gated like the
Pillow/geopy seams.  Mechanics shared by the hermetic engines:

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


_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


class _BlockParser(HTMLParser):
    """Collects (text, link_chars, total_chars, is_heading) per block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int, bool]] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._total_chars = 0
        self._skip_depth = 0
        self._link_depth = 0
        self._heading_depth = 0
        self._saw_heading = False

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append(
                (text, self._link_chars, self._total_chars, self._saw_heading)
            )
        self._parts = []
        self._link_chars = 0
        self._total_chars = 0
        self._saw_heading = self._heading_depth > 0

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
        if tag in _HEADING_TAGS:
            self._heading_depth += 1
            self._saw_heading = True

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if self._skip_depth:
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
        if tag in _HEADING_TAGS:
            self._heading_depth = max(0, self._heading_depth - 1)
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
    for text, link_chars, total_chars, _heading in p.blocks:
        density = link_chars / total_chars if total_chars else 1.0
        if len(text) >= min_block_chars and density <= max_link_density:
            kept.append(text)
        else:
            dropped += 1
    return "\n\n".join(kept), len(kept), dropped


# compact English stopword list (public linguistic commons) for the
# jusText stopword-density feature; documents in other languages degrade
# to the density-free branch (stopword density ~0 → the length/link
# rules decide), which is jusText's own "stoplist-free" operating mode.
STOPWORDS_EN = frozenset(
    """a about above after again against all am an and any are as at be
    because been before being below between both but by could did do does
    doing down during each few for from further had has have having he her
    here hers herself him himself his how i if in into is it its itself
    just me more most my myself no nor not now of off on once only or other
    our ours ourselves out over own same she should so some such than that
    the their theirs them themselves then there these they this those
    through to too under until up very was we were what when where which
    while who whom why will with you your yours yourself yourselves""".split()
)

_GOOD, _BAD, _SHORT, _NEARGOOD = "good", "bad", "short", "neargood"


def _stopword_density(text: str) -> float:
    words = text.split()
    if not words:
        return 0.0
    hits = sum(
        1 for w in words if w.lower().strip(".,;:!?\"'()[]") in STOPWORDS_EN
    )
    return hits / len(words)


def _justext_classify(
    blocks: list[tuple[str, int, int, bool]],
    *,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    max_heading_distance: int = 200,
) -> list[bool]:
    """Keep/drop per block by the full jusText algorithm (Pomikálek
    2011, public literature): context-free classes good / bad / short /
    neargood from length, stopword density and link density, then the
    CONTEXT-SENSITIVE revision — short and neargood blocks take the
    class of their neighborhood, and short headings within
    ``max_heading_distance`` characters of a following good block are
    promoted.  This is what recovers headings, captions and short
    quotes that sit inside good content while still dropping identical-
    looking strings inside navigation clusters — the precision/recall
    step the plain AND-filter (``extract_blocks``) trades away."""
    cf: list[str] = []
    heading: list[bool] = []
    for text, link_chars, total_chars, is_heading in blocks:
        heading.append(is_heading)
        density = link_chars / total_chars if total_chars else 1.0
        sw = _stopword_density(text)
        if density > max_link_density:
            cf.append(_BAD)
        elif len(text) < length_low:
            cf.append(_BAD if link_chars > 0 else _SHORT)
        elif sw > stopwords_high:
            cf.append(_GOOD if len(text) > length_high else _NEARGOOD)
        elif sw > stopwords_low:
            cf.append(_NEARGOOD)
        else:
            cf.append(_BAD)

    n = len(cf)

    def neighbour(i: int, step: int, ignore_neargood: bool) -> str:
        j = i + step
        while 0 <= j < n:
            c = cf[j]
            if c == _GOOD or c == _BAD:
                return c
            if c == _NEARGOOD and not ignore_neargood:
                return c
            j += step
        return _BAD  # document boundary counts as bad context

    # heading promotion: a short heading with a good block within
    # max_heading_distance characters below it becomes near-good
    revised = list(cf)
    for i in range(n):
        if not (heading[i] and cf[i] == _SHORT):
            continue
        dist, j = 0, i + 1
        while j < n and dist < max_heading_distance:
            if cf[j] == _GOOD:
                revised[i] = _NEARGOOD
                break
            dist += len(blocks[j][0])
            j += 1
    cf = revised

    final = list(cf)
    for i in range(n):
        if cf[i] == _SHORT:
            prev = neighbour(i, -1, ignore_neargood=True)
            nxt = neighbour(i, +1, ignore_neargood=True)
            if prev == _GOOD and nxt == _GOOD:
                final[i] = _GOOD
            elif prev == _BAD and nxt == _BAD:
                final[i] = _BAD
            # mixed: good iff a neargood block sits between this block
            # and the bad side (jusText's revised rule)
            elif (
                prev == _BAD
                and neighbour(i, -1, ignore_neargood=False) == _NEARGOOD
            ) or (
                nxt == _BAD
                and neighbour(i, +1, ignore_neargood=False) == _NEARGOOD
            ):
                final[i] = _GOOD
            else:
                final[i] = _BAD
        elif cf[i] == _NEARGOOD:
            prev = neighbour(i, -1, ignore_neargood=True)
            nxt = neighbour(i, +1, ignore_neargood=True)
            final[i] = _BAD if (prev == _BAD and nxt == _BAD) else _GOOD
    return [c == _GOOD for c in final]


def extract_blocks_justext(
    html: str,
    *,
    length_low: int = 70,
    length_high: int = 200,
    stopwords_low: float = 0.30,
    stopwords_high: float = 0.32,
    max_link_density: float = 0.2,
    max_heading_distance: int = 200,
) -> tuple[str, int, int]:
    """(text, n_blocks_kept, n_blocks_dropped) via the full jusText
    classification (see :func:`_justext_classify`)."""
    p = _BlockParser()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        return "", 0, 0
    keep = _justext_classify(
        p.blocks,
        length_low=length_low,
        length_high=length_high,
        stopwords_low=stopwords_low,
        stopwords_high=stopwords_high,
        max_link_density=max_link_density,
        max_heading_distance=max_heading_distance,
    )
    kept = [b[0] for b, k in zip(p.blocks, keep) if k]
    return "\n\n".join(kept), len(kept), len(p.blocks) - len(kept)


def extract_blocks_trafilatura(html: str) -> tuple[str, int, int]:
    """(text, n_blocks_kept, n_blocks_dropped) via the trafilatura
    library (import-gated like the Pillow/geopy seams — the container
    does not ship it; the hermetic engines above are the default).
    Block counts are paragraph counts of the extracted text; dropped
    counts are not reported by trafilatura and return -1."""
    try:
        import trafilatura
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "engine='trafilatura' requires the optional trafilatura "
            "package; use engine='justext' (built-in) instead"
        ) from e
    text = trafilatura.extract(html or "") or ""
    paras = [p for p in text.split("\n") if p.strip()]
    return "\n\n".join(paras), len(paras), -1


_ENGINES = {
    "core": lambda html, kw: extract_blocks(
        html,
        kw.get("max_link_density", 0.5),
        kw.get("min_block_chars", 25),
    ),
    "justext": lambda html, kw: extract_blocks_justext(
        html,
        **{
            k: v
            for k, v in kw.items()
            if k
            in (
                "length_low",
                "length_high",
                "stopwords_low",
                "stopwords_high",
                "max_link_density",
                "max_heading_distance",
            )
        },
    ),
    "trafilatura": lambda html, kw: extract_blocks_trafilatura(html),
}


def extract_documents(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
    max_link_density: float | None = None,
    min_block_chars: int | None = None,
    engine: str = "core",
    **engine_kw,
) -> DataFrame:
    """Input columns (minus ``html_col``) + ``out_col``,
    ``n_blocks``, ``n_boilerplate_blocks`` — the extraction front end
    of the curation pipeline.  Row-local Arrow kernel; no shuffle.

    ``engine`` selects the extraction kernel, all same contract:
    ``"core"`` (default, the length-AND-link-density filter),
    ``"justext"`` (full context-sensitive jusText — better recall on
    headings/captions inside good content), ``"trafilatura"`` (the
    optional external library, import-gated).  Extra ``engine_kw`` pass
    through to the selected kernel (e.g. ``length_low=`` for justext).
    """
    if engine not in _ENGINES:
        raise ValueError(
            f"unknown engine {engine!r} (core|justext|trafilatura)"
        )
    kw = dict(engine_kw)
    if engine == "core":
        # the two named knobs belong to the core filter (defaults 0.5/25);
        # justext / trafilatura carry their own published defaults
        kw.setdefault(
            "max_link_density",
            0.5 if max_link_density is None else max_link_density,
        )
        kw.setdefault(
            "min_block_chars",
            25 if min_block_chars is None else min_block_chars,
        )
    else:
        # an explicitly-passed named knob must not be silently dropped
        # (advisor finding): justext shares max_link_density, so seed it;
        # anything the engine cannot honor is an error, not a no-op
        if max_link_density is not None:
            if engine == "justext":
                kw.setdefault("max_link_density", max_link_density)
            else:
                raise ValueError(
                    f"engine={engine!r} does not take max_link_density"
                )
        if min_block_chars is not None:
            raise ValueError(
                f"engine={engine!r} does not take min_block_chars "
                "(justext uses length_low/length_high instead)"
            )
    kernel_fn = _ENGINES[engine]
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
            res = pdf[html_col].map(lambda h: kernel_fn(h, kw))
            out = pdf[keep_names].copy()
            out[out_col] = [r[0] for r in res]
            out["n_blocks"] = [r[1] for r in res]
            out["n_boilerplate_blocks"] = [r[2] for r in res]
            yield out

    return df.mapInPandas(kernel, out_schema)
