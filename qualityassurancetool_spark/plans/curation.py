"""Config-driven corpus curation — the training-data twin of the QC
chain: the reference drives its sensor checks from validated YAML
(``conf/config.yaml`` + ``src/yaml_schema.py``); this module gives the
curation side the same contract.  One validated config object → one
Catalyst plan: language gate, quality threshold, repetition/symbol
caps, domain blocklist, exact near-dup collapse, per-language keep
fraction — each an optional rule, all applied in one pass over one scan.

Every decision is recorded: ``curate`` returns per-doc ``keep`` +
``drop_reason`` (FIRST failing rule, in documented order) so a 100 TB
run can report per-rule kill counts without a second pass.

Scale shape: identical to the capstone query — staged
``compute_behind_barrier`` projections (normalize → tokens → scores
computed exactly once per row, post-repartition), the dedup group join
keyed on the same digest as its aggregation, filters as field accesses.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.config import ConfigError

# rule evaluation order (first failing rule names the drop_reason)
RULES = (
    "lang",
    "quality",
    "dup_lines",
    "word_rep",
    "symbols",
    "badwords",
    "c4_page",
    "gopher",
    "pii",
    "blocked_domain",
    "classifier",
    "dsir",
    "duplicate",
    "near_duplicate",
    "sampled_out",
)


@dataclass
class CurationConfig:
    """Validated curation rules; ``None`` disables a rule."""

    langs: list[str] | None = None
    min_quality: float | None = None
    max_dup_line_fraction: float | None = None
    max_word_rep_ratio: float | None = None
    max_symbol_ratio: float | None = None
    max_pii_total: int | None = None
    c4_page_rules: bool = False
    gopher_rules: bool = False  # Rae et al. 2021 A.1.1 page filters
    badwords: list[str] = field(default_factory=list)
    min_classifier_prob: float | None = None
    min_dsir_score: float | None = None
    blocked_domains: list[str] = field(default_factory=list)
    dedup: str = "exact"  # "exact" | "none"
    sample_fractions: dict[str, float] | None = None  # per-lang keep frac
    sample_salt: str = "cur:"

    @classmethod
    def from_dict(cls, d: dict) -> "CurationConfig":
        known = {
            "langs", "min_quality", "max_dup_line_fraction",
            "max_word_rep_ratio", "max_symbol_ratio", "max_pii_total",
            "c4_page_rules", "gopher_rules", "badwords",
            "min_classifier_prob",
            "min_dsir_score", "blocked_domains", "dedup",
            "sample_fractions", "sample_salt",
        }
        unknown = set(d) - known
        if unknown:
            raise ConfigError(f"unknown curation keys: {sorted(unknown)}")
        for k in ("min_quality", "max_dup_line_fraction",
                  "max_word_rep_ratio", "max_symbol_ratio",
                  "max_pii_total", "min_classifier_prob",
                  "min_dsir_score"):
            v = d.get(k)
            if v is not None and not isinstance(v, (int, float)):
                raise ConfigError(f"{k} must be numeric, got {v!r}")
        v = d.get("max_pii_total")
        if v is not None and int(v) < 0:
            raise ConfigError(f"max_pii_total must be >= 0, got {v}")
        v = d.get("min_classifier_prob")
        if v is not None and not (0.0 <= float(v) <= 1.0):
            raise ConfigError(
                f"min_classifier_prob must be in [0, 1], got {v}"
            )
        for k in ("max_dup_line_fraction", "max_word_rep_ratio",
                  "max_symbol_ratio"):
            v = d.get(k)
            if v is not None and not (0.0 <= float(v) <= 1.0):
                raise ConfigError(f"{k} must be in [0, 1], got {v}")
        if not isinstance(d.get("gopher_rules", False), bool):
            raise ConfigError(
                f"gopher_rules must be a bool, got {d['gopher_rules']!r}"
            )
        if not isinstance(d.get("c4_page_rules", False), bool):
            raise ConfigError(
                f"c4_page_rules must be a bool, got {d['c4_page_rules']!r}"
            )
        bw = d.get("badwords", [])
        if bw is not None and not isinstance(bw, (list, tuple)):
            raise ConfigError(f"badwords must be a list, got {bw!r}")
        bd = d.get("blocked_domains", [])
        if bd is not None and not isinstance(bd, (list, tuple)):
            # a YAML scalar would iterate per CHARACTER and the
            # blocklist would silently match nothing (review finding)
            raise ConfigError(
                f"blocked_domains must be a list, got {bd!r}"
            )
        if d.get("dedup", "exact") not in ("exact", "none"):
            raise ConfigError(f"dedup must be exact|none, got {d['dedup']!r}")
        fr = d.get("sample_fractions")
        if fr is not None:
            for lang, f_ in fr.items():
                if not (0.0 <= float(f_) <= 1.0):
                    raise ConfigError(
                        f"sample_fractions[{lang!r}] must be in [0,1]"
                    )
        langs = d.get("langs")
        if langs is not None and (
            not isinstance(langs, (list, tuple)) or not langs
        ):
            raise ConfigError("langs must be a non-empty list or null")
        return cls(
            langs=list(langs) if langs else None,
            min_quality=d.get("min_quality"),
            max_dup_line_fraction=d.get("max_dup_line_fraction"),
            max_word_rep_ratio=d.get("max_word_rep_ratio"),
            max_symbol_ratio=d.get("max_symbol_ratio"),
            max_pii_total=(
                int(d["max_pii_total"])
                if d.get("max_pii_total") is not None
                else None
            ),
            c4_page_rules=bool(d.get("c4_page_rules", False)),
            gopher_rules=bool(d.get("gopher_rules", False)),
            min_classifier_prob=(
                float(d["min_classifier_prob"])
                if d.get("min_classifier_prob") is not None
                else None
            ),
            min_dsir_score=(
                float(d["min_dsir_score"])
                if d.get("min_dsir_score") is not None
                else None
            ),
            badwords=list(d.get("badwords") or []),
            blocked_domains=list(d.get("blocked_domains", [])),
            dedup=d.get("dedup", "exact"),
            sample_fractions=dict(fr) if fr else None,
            sample_salt=d.get("sample_salt", "cur:"),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "CurationConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})


def curate(
    docs: DataFrame,
    cfg: CurationConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    classifier_model: tuple[list[float], float] | None = None,
    near_dup_drops: DataFrame | None = None,
    dsir_log_ratio: tuple[float, ...] | None = None,
) -> DataFrame:
    """Per-doc curation decision sheet: input columns +
    ``predicted_lang, quality, keep (bool), drop_reason (str|null)``.

    ``classifier_model`` is the (weights, bias) pair from
    ``operators.classifier.train_log_odds`` — required when
    ``cfg.min_classifier_prob`` is set; scoring joins nothing (JSON
    weight literal + row-local fold).  ``near_dup_drops`` is an optional
    (id) frame of externally computed near-duplicate victims (MinHash
    clusters, SemDeDup, winnowing pairs …); they drop with reason
    ``near_duplicate`` unless an earlier rule already claimed them —
    the decision sheet stays ONE pass over one scan either way (the
    drop set enters as a broadcast-able semi-join mark)."""
    from qualityassurancetool_spark.functions.hashing import normalize_text
    from qualityassurancetool_spark.functions.partitioning import (
        compute_behind_barrier,
        ensure_min_parallelism,
    )

    in_cols = set(docs.columns)
    from qualityassurancetool_spark.operators.quality_filters import (
        domain_blocklist_hit,
        dup_line_fraction,
        symbol_ratio,
        word_rep_ratio,
    )
    from qualityassurancetool_spark.operators.sampling import uniform_hash
    from qualityassurancetool_spark.operators.text import (
        lang_score_struct,
        predict_lang_from_scores,
        quality_score_parts,
    )

    docs = ensure_min_parallelism(docs)
    lower = F.lower(F.col(text_col))
    normed = compute_behind_barrier(
        docs, {"_norm": normalize_text(F.col(text_col))}
    )
    toked = compute_behind_barrier(
        normed, {"_toks": F.split(F.col("_norm"), " ")}
    )
    scored = compute_behind_barrier(
        toked, {"_ls": lang_score_struct(F.col("_toks"))}
    )
    n = F.col("_norm")
    n_tok = F.when(F.length(n) == 0, F.lit(0)).otherwise(
        F.size(F.col("_toks"))
    )
    awl = F.when(n_tok > 0, (F.length(n) - (n_tok - 1)) / n_tok).cast(
        "double"
    )
    measures = {
        "predicted_lang": predict_lang_from_scores(F.col("_ls")),
        "quality": F.round(
            quality_score_parts(n_tok, awl, F.col("_ls.en")), 6
        ),
    }
    if cfg.max_dup_line_fraction is not None:
        measures["_dlf"] = dup_line_fraction(F.col(text_col))
    if cfg.max_word_rep_ratio is not None:
        measures["_wrr"] = word_rep_ratio(F.col("_toks"))
    if cfg.max_symbol_ratio is not None:
        measures["_sym"] = symbol_ratio(n)
    if cfg.max_pii_total is not None:
        from qualityassurancetool_spark.operators.quality_filters import (
            pii_counts,
        )

        pii = pii_counts(lower)
        total = None
        for c in pii.values():
            total = c if total is None else total + c
        measures["_pii"] = total
    if cfg.blocked_domains:
        measures["_blocked"] = domain_blocklist_hit(
            lower, cfg.blocked_domains
        )
    if cfg.badwords:
        from qualityassurancetool_spark.operators.quality_filters import (
            badword_hit,
        )

        measures["_badword"] = badword_hit(n, F.col("_toks"), cfg.badwords)
    if cfg.min_classifier_prob is not None:
        if classifier_model is None:
            raise ConfigError(
                "min_classifier_prob requires a classifier_model"
            )
        from qualityassurancetool_spark.functions.literals import (
            double_array_literal,
        )
        from qualityassurancetool_spark.operators.classifier import (
            hashed_ngram_buckets,
        )

        weights, bias = classifier_model
        toks_ne = F.when(
            F.length(n) == 0, F.array().cast("array<string>")
        ).otherwise(F.col("_toks"))
        # bucket array behind its own barrier: it is referenced three
        # times below (fold, two size uses) and must stay an attribute
        scored = compute_behind_barrier(
            scored, {"_clf_b": hashed_ngram_buckets(toks_ne, len(weights))}
        )
        buckets = F.col("_clf_b")
        w = double_array_literal(tuple(float(x) for x in weights))
        nb = F.size(buckets)
        fold = F.aggregate(
            buckets,
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(w, (b + 1).cast("int")),
        )
        s = F.when(nb > 0, F.lit(float(bias)) + fold / nb).otherwise(
            F.lit(float(bias))
        )
        measures["_clf_prob"] = F.lit(1.0) / (F.lit(1.0) + F.exp(-s))
    if cfg.c4_page_rules:
        from qualityassurancetool_spark.operators.line_dedup import (
            C4_PAGE_BLOCKLIST,
            c4_line_keep,
            split_lines,
        )

        kept = F.filter(split_lines(F.col(text_col)), c4_line_keep)
        block = F.lit(False)
        for phrase in C4_PAGE_BLOCKLIST:
            block = block | lower.contains(phrase)
        measures["_c4_drop"] = block | (F.size(kept) < 1)
    if cfg.gopher_rules:
        from qualityassurancetool_spark.operators.quality_filters import (
            gopher_signal_columns,
        )

        # stage the two arrays once (attribute-only contract), then the
        # seven signals as measures; the rule CASE reads them by name
        scored = compute_behind_barrier(
            scored,
            {
                "_gw": F.filter(
                    F.col("_toks"), lambda x: F.length(x) > 0
                ),
                "_gln": F.transform(
                    F.split(
                        F.coalesce(F.col(text_col), F.lit("")), "\n"
                    ),
                    lambda x: F.trim(x),
                ),
            },
        )
        # stage under _g_ names: a caller's own n_words/… column must
        # come back untouched, not duplicated (review finding, round 9)
        measures.update(
            {
                "_g_" + name: col
                for name, col in gopher_signal_columns(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.col("_gw"),
                    F.col("_gln"),
                ).items()
            }
        )
    if cfg.min_dsir_score is not None:
        if dsir_log_ratio is None:
            raise ConfigError("min_dsir_score requires a dsir_log_ratio")
        from qualityassurancetool_spark.functions.literals import (
            double_array_literal as _dal,
        )
        from qualityassurancetool_spark.operators.dsir import (
            feature_buckets as _dsir_fb,
        )

        # same attribute discipline as the classifier buckets
        scored = compute_behind_barrier(
            scored,
            {"_dsir_b": _dsir_fb(
                F.filter(F.col("_toks"), lambda t: F.length(t) > 0),
                len(dsir_log_ratio),
            )},
        )
        lam = _dal(tuple(float(x) for x in dsir_log_ratio))
        nb = F.size("_dsir_b")
        fold = F.aggregate(
            F.col("_dsir_b"),
            F.lit(0.0),
            lambda acc, b: acc + F.element_at(lam, (b + 1).cast("int")),
        )
        # per-feature MEAN log-ratio: a length-invariant "how much does
        # this doc look like the target" score the threshold applies to
        measures["_dsir"] = F.when(nb > 0, fold / nb).otherwise(F.lit(0.0))
    out = compute_behind_barrier(scored, measures)
    if near_dup_drops is not None:
        mark = near_dup_drops.select(
            F.col(id_col), F.lit(True).alias("_near_dup")
        ).dropDuplicates([id_col])
        out = out.join(mark, id_col, "left")

    # first-failing-rule CASE chain, in RULES order
    reason = F.lit(None).cast("string")
    checks: list[tuple[str, F.Column]] = []
    if cfg.langs is not None:
        checks.append(
            ("lang", ~F.col("predicted_lang").isin(*cfg.langs))
        )
    if cfg.min_quality is not None:
        checks.append(("quality", F.col("quality") < cfg.min_quality))
    if cfg.max_dup_line_fraction is not None:
        checks.append(
            ("dup_lines", F.col("_dlf") > cfg.max_dup_line_fraction)
        )
    if cfg.max_word_rep_ratio is not None:
        checks.append(
            ("word_rep", F.col("_wrr") > cfg.max_word_rep_ratio)
        )
    if cfg.max_symbol_ratio is not None:
        checks.append(("symbols", F.col("_sym") > cfg.max_symbol_ratio))
    if cfg.badwords:
        checks.append(("badwords", F.col("_badword")))
    if cfg.c4_page_rules:
        checks.append(("c4_page", F.col("_c4_drop")))
    if cfg.gopher_rules:
        from qualityassurancetool_spark.operators.quality_filters import (
            gopher_fail_expr,
        )

        checks.append(
            ("gopher", gopher_fail_expr(prefix="_g_").isNotNull())
        )
    if cfg.max_pii_total is not None:
        checks.append(("pii", F.col("_pii") > cfg.max_pii_total))
    if cfg.blocked_domains:
        checks.append(("blocked_domain", F.col("_blocked")))
    if cfg.min_classifier_prob is not None:
        checks.append(
            ("classifier", F.col("_clf_prob") < cfg.min_classifier_prob)
        )
    if cfg.min_dsir_score is not None:
        checks.append(("dsir", F.col("_dsir") < cfg.min_dsir_score))
    if cfg.dedup == "exact":
        # the keeper is the min id among rows that PASS every preceding
        # rule — a representative killed by an earlier rule (lang,
        # quality, ...) must not drag its surviving copies down with it
        # under first-failing-rule semantics: one copy per content group
        # survives whenever any copy passes the other filters
        pre_fail = F.lit(False)
        for _, cond in checks:
            pre_fail = pre_fail | F.coalesce(cond, F.lit(False))
        keep_id = F.min(F.when(~pre_fail, F.col(id_col))).over(
            Window.partitionBy(F.md5(F.col("_norm")))
        )
        checks.append(("duplicate", F.col(id_col) != keep_id))
    if near_dup_drops is not None:
        checks.append(
            ("near_duplicate", F.coalesce(F.col("_near_dup"), F.lit(False)))
        )
    if cfg.sample_fractions is not None:
        frac = F.lit(0.0)
        for lang in sorted(cfg.sample_fractions):
            frac = F.when(
                F.col("predicted_lang") == lang,
                F.lit(float(cfg.sample_fractions[lang])),
            ).otherwise(frac)
        checks.append(
            (
                "sampled_out",
                uniform_hash(F.col(id_col), cfg.sample_salt) >= frac,
            )
        )
    for name, failed in reversed(checks):
        reason = F.when(failed, F.lit(name)).otherwise(reason)
    # evaluate rules in declared order: earlier rule wins the reason
    out = out.withColumn("drop_reason", reason)
    out = out.withColumn("keep", F.col("drop_reason").isNull())
    return out.drop(
        # only columns CURATE added are dropped; internal gopher
        # signals live under _g_ names, so a caller's own n_words/…
        # column comes back untouched AND unduplicated (review
        # findings, rounds 8-9)
        *[c for c in ("_norm", "_toks", "_ls", "_dlf", "_wrr", "_sym",
                      "_pii", "_blocked", "_clf_b", "_clf_prob",
                      "_c4_drop", "_dsir_b", "_dsir", "_near_dup",
                      "_gw", "_gln", "_g_n_words", "_g_mean_word_len",
                      "_g_symbol_word_ratio", "_g_bullet_line_frac",
                      "_g_ellipsis_line_frac", "_g_alpha_word_frac",
                      "_g_stopword_hits")
          if c not in in_cols
          if c in out.columns]
    )


def drop_report(decisions: DataFrame) -> DataFrame:
    """Per-rule kill counts + kept count from a ``curate`` output."""
    return (
        decisions.groupBy(
            F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("rule")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("rule")
    )


def drop_examples(
    decisions: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic audit samples: ``k`` example documents per
    drop_reason (plus 'kept') from a ``curate`` output — the thing a
    human reviews to sanity-check each rule before a 100 TB run.
    Reuses the md5-rank reservoir (operators/sampling), so re-runs
    show the same examples."""
    from qualityassurancetool_spark.operators.sampling import (
        deterministic_topk_per_stratum,
    )

    tagged = decisions.withColumn(
        "rule", F.coalesce(F.col("drop_reason"), F.lit("kept"))
    )
    return deterministic_topk_per_stratum(
        tagged.select("rule", id_col, text_col), k, "rule", id_col
    ).orderBy("rule", id_col)
