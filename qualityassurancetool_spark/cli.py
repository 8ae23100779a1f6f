"""Command-line entry point with dotted config overrides.

The reference's operational surface is ``python src/main.py
time.start=... time.end=...`` — Hydra composes ``conf/config.yaml`` with
dotted CLI overrides (reference ``src/main.py:280``,
``README.adoc:126-131``).  This module reproduces that surface without
Hydra: a YAML config file merged with ``key.path=value`` tokens, feeding
the windowed batch runner.

Commands::

    python -m qualityassurancetool_spark run \
        --config qc.yaml data.input=/data/obs data.flags_out=/data/flags \
        time.start=2023-01-01T00:00:00 time.end=2023-01-02T00:00:00 \
        time.window=10min time.overlap=50min location.max_velocity=12

    python -m qualityassurancetool_spark validate --config qc.yaml
    python -m qualityassurancetool_spark template --thing events --out qc.yaml

    python -m qualityassurancetool_spark curate \
        --config rules.yaml data.input=/data/docs data.out=/data/curated \
        min_quality=0.5 langs=[en]

Override values are parsed as YAML scalars (``a.b=3`` → int,
``a.b=null`` → None, ``a.b=[1,2]`` → list), matching OmegaConf's typing
behavior.
"""

from __future__ import annotations

import argparse
import copy
import datetime as dt
import sys
from typing import Any

import yaml

from qualityassurancetool_spark.config import ConfigError, QCConfig

# orchestration-level sections consumed by the CLI itself, not QCConfig
_RUN_SECTIONS = ("time", "data", "run")


def parse_override(token: str) -> tuple[list[str], Any]:
    """``a.b.c=v`` → (["a","b","c"], parsed v).  Values go through YAML
    scalar parsing so numbers/bools/null/lists type correctly."""
    if "=" not in token:
        raise ConfigError(
            f"override {token!r} is not of the form key.path=value"
        )
    key, raw = token.split("=", 1)
    key = key.strip()
    if not key:
        raise ConfigError(f"override {token!r} has an empty key")
    try:
        value = yaml.safe_load(raw) if raw != "" else ""
    except yaml.YAMLError:
        value = raw  # unparseable YAML → keep the literal string
    return key.split("."), value


def apply_overrides(cfg: dict, tokens: list[str]) -> dict:
    """Deep-merge dotted overrides into a config dict (pure: returns a
    new dict).  Intermediate mappings are created on demand; overriding
    through a non-mapping is an error with the offending path named."""
    out = copy.deepcopy(cfg)
    for token in tokens:
        path, value = parse_override(token)
        node = out
        for i, part in enumerate(path[:-1]):
            nxt = node.get(part)
            if nxt is None:
                nxt = node[part] = {}
            elif not isinstance(nxt, dict):
                raise ConfigError(
                    f"override {token!r}: {'.'.join(path[: i + 1])} is a "
                    f"{type(nxt).__name__}, not a mapping"
                )
            node = nxt
        node[path[-1]] = value
    return out


def load_run_config(
    config_path: str | None, overrides: list[str]
) -> tuple[dict, dict]:
    """→ (run_sections, qc_config_dict).  The YAML file holds BOTH the
    orchestration sections (``time``/``data``) and the QC subtree, like
    the reference's single conf/config.yaml; overrides may touch
    either."""
    base: dict = {}
    if config_path:
        with open(config_path) as f:
            base = yaml.safe_load(f) or {}
    merged = apply_overrides(base, overrides)
    run = {k: merged.pop(k, {}) or {} for k in _RUN_SECTIONS}
    return run, merged


def _parse_when(v, what: str) -> dt.datetime:
    if isinstance(v, dt.datetime):
        return v
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day)
    if isinstance(v, str):
        return dt.datetime.fromisoformat(v)
    raise ConfigError(f"{what}: expected an ISO datetime, got {v!r}")


def cmd_run(args, overrides: list[str]) -> int:
    run, qc_dict = load_run_config(args.config, overrides)
    cfg = QCConfig.from_dict(qc_dict)
    time_c, data_c = run["time"], run["data"]
    for req, owner in ((time_c, "time"), (data_c, "data")):
        if not isinstance(req, dict):
            raise ConfigError(f"{owner}: expected a mapping")
    missing = [
        k
        for k, c, o in (
            ("time.start", time_c, "start"),
            ("time.end", time_c, "end"),
            ("data.input", data_c, "input"),
            ("data.flags_out", data_c, "flags_out"),
        )
        if c.get(o) is None
    ]
    if missing:
        raise ConfigError(f"missing required settings: {', '.join(missing)}")
    start = _parse_when(time_c["start"], "time.start")
    end = _parse_when(time_c["end"], "time.end")

    from pyspark.sql import functions as F

    from qualityassurancetool_spark.plans.qc_pipeline import run_qc_pipeline
    from qualityassurancetool_spark.session import get_spark
    from qualityassurancetool_spark.sources.sinks import upsert_flags_table
    from qualityassurancetool_spark.streaming.micro_batch import (
        windowed_batch_runner,
    )

    spark = get_spark(run.get("run", {}).get("app_name", "qat-run"))
    try:
        if data_c.get("table", "observations") == "events":
            from qualityassurancetool_spark.schema import (
                events_as_observations,
            )

            obs_all = events_as_observations(spark, data_c["input"])
        else:
            obs_all = spark.read.parquet(data_c["input"])

        def load_window(lo: dt.datetime, hi: dt.datetime):
            return obs_all.where(
                (F.col("phenomenon_time") >= F.lit(lo))
                & (F.col("phenomenon_time") < F.lit(hi))
            )

        def sink(df, lo, hi):
            # row-level upsert: the default 10-min windows put many
            # windows in one day — a per-day overwrite here deleted the
            # day's earlier windows' flags (review finding, round 8)
            upsert_flags_table(df, data_c["flags_out"])

        n = windowed_batch_runner(
            spark,
            load_window,
            lambda df: run_qc_pipeline(df, cfg, spark),
            sink,
            start=start,
            end=end,
            width=time_c.get("window", "10min"),
            overlap=time_c.get("overlap", 0.0),
            lookback=time_c.get("lookback", 0.0),
        )
        print(f"ran {n} window(s): [{start} .. {end}) -> "
              f"{data_c['flags_out']}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_curate(args, overrides: list[str]) -> int:
    """Corpus-side twin of ``run``: config-driven curation over a
    documents parquet → per-doc decision sheet + per-rule kill report."""
    run, rules = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("out"):
        raise ConfigError("missing required settings: data.input, data.out")

    from qualityassurancetool_spark.plans.curation import (
        CurationConfig,
        curate,
        drop_report,
    )
    from qualityassurancetool_spark.session import get_spark

    cfg = CurationConfig.from_dict(rules)
    spark = get_spark(run.get("run", {}).get("app_name", "qat-curate"))
    try:
        if data_c.get("table", "parquet") == "documents":
            from qualityassurancetool_spark.schema import load_table

            docs = load_table(spark, data_c["input"], "documents")
        else:
            docs = spark.read.parquet(data_c["input"])
        decisions = curate(docs, cfg)
        decisions.write.mode("overwrite").parquet(data_c["out"])
        back = spark.read.parquet(data_c["out"])
        for r in drop_report(back).collect():
            print(f"{r['rule']}: {r['n']}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_report(args, overrides: list[str]) -> int:
    """Dataset-card numbers over a documents parquet: volume, language
    mix, exact-dup rate, PII exposure, signal quantiles — printed as a
    markdown card and optionally written as parquet
    (``data.out=...``)."""
    run, _ = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input"):
        raise ConfigError("missing required setting: data.input")

    from qualityassurancetool_spark.plans.corpus_report import (
        corpus_report,
        report_markdown,
    )
    from qualityassurancetool_spark.session import get_spark

    spark = get_spark(run.get("run", {}).get("app_name", "qat-report"))
    try:
        if data_c.get("table", "parquet") == "documents":
            from qualityassurancetool_spark.schema import load_table

            docs = load_table(spark, data_c["input"], "documents")
        else:
            docs = spark.read.parquet(data_c["input"])
        rep = corpus_report(docs)
        if data_c.get("out"):
            rep.write.mode("overwrite").parquet(data_c["out"])
            rep = spark.read.parquet(data_c["out"])
        print(report_markdown(rep.orderBy("metric")))
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_dedup(args, overrides: list[str]) -> int:
    """Deduplication report over a documents parquet.  ``method``
    selects the family (all fast-hash production modes):

    - ``exact``: (content_hash, keep_id, n_dups) collapse sheet;
    - ``simhash``: banded-Hamming SimHash near-dup pairs
      (``bits= bands= max_hamming=``; pigeonhole-exact while
      ``max_hamming < bands``);
    - ``minhash``: MinHash+LSH verified near-dup pairs; pass
      ``band_batches=N`` to run the band-batched bounded-state schedule
      (``work_dir=`` overrides its scratch location) — the single-JVM /
      spill-bounded path for 100 M-doc corpora (docs/SCALE.md);
    - ``fingerprint``: winnowing copy-candidate pairs with containment;
    - ``spans``: ExactSubstr duplicated-span removal (cleaned text);
    - ``lines``: cross-document duplicate-line removal (keep-first);
    - ``semantic``: SemDeDup over an embeddings parquet.
    """
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("out"):
        raise ConfigError("missing required settings: data.input, data.out")
    method = knobs.get("method", "exact")
    if method not in (
        "exact", "minhash", "simhash", "fingerprint", "spans", "lines",
        "semantic",
    ):
        raise ConfigError(
            f"unknown dedup method {method!r} "
            "(exact|minhash|simhash|fingerprint|spans|lines|semantic)"
        )
    if method == "simhash":
        # validate BEFORE the session (config errors must never cost
        # one); the operator re-checks, but as a raw ValueError
        sh_bits = int(knobs.get("bits", 32))
        sh_bands = int(knobs.get("bands", 4))
        sh_maxh = int(knobs.get("max_hamming", 3))
        if sh_bits % sh_bands or sh_maxh >= sh_bands:
            raise ConfigError(
                f"dedup simhash: bands={sh_bands} must divide "
                f"bits={sh_bits} and exceed max_hamming={sh_maxh} "
                "(the pigeonhole recall guarantee)"
            )

    from pyspark.sql import functions as F

    from qualityassurancetool_spark.session import get_spark

    spark = get_spark(run.get("run", {}).get("app_name", "qat-dedup"))
    try:
        if method == "semantic":
            from qualityassurancetool_spark.operators.clustering import (
                semantic_dedup,
            )

            emb = spark.read.parquet(data_c["input"])
            out = semantic_dedup(
                emb,
                k=int(knobs.get("k", 8)),
                max_iter=int(knobs.get("max_iter", 5)),
                threshold=float(knobs.get("threshold", 0.85)),
            )
            out.write.mode("overwrite").parquet(data_c["out"])
            back = spark.read.parquet(data_c["out"])
            print(f"vectors: {back.count()}")
            print(f"dropped: {back.where('NOT kept').count()}")
            return 0

        if data_c.get("table", "parquet") == "documents":
            from qualityassurancetool_spark.schema import load_table

            docs = load_table(spark, data_c["input"], "documents")
        else:
            docs = spark.read.parquet(data_c["input"])
        if method == "exact":
            from qualityassurancetool_spark.operators.dedup import (
                exact_dedup,
            )

            out = exact_dedup(docs)
            out.write.mode("overwrite").parquet(data_c["out"])
            back = spark.read.parquet(data_c["out"])
            n_groups = back.count()
            n_extra = back.agg(
                F.sum(F.col("n_dups") - 1).alias("x")
            ).collect()[0]["x"]
            print(f"groups: {n_groups}")
            print(f"duplicates: {n_extra or 0}")
        elif method == "minhash":
            from qualityassurancetool_spark.operators.dedup import (
                minhash_admit,
                minhash_dedup,
                minhash_dedup_batched,
            )

            kw = dict(
                num_hashes=int(knobs.get("num_hashes", 16)),
                bands=int(knobs.get("bands", 4)),
                shingle_k=int(knobs.get("shingle_k", 3)),
                threshold=float(knobs.get("threshold", 0.7)),
                hash_mode=knobs.get("hash_mode", "fast"),
            )
            bb = knobs.get("band_batches")
            state = knobs.get("state")
            if state and (bb is not None or knobs.get("work_dir")):
                raise ConfigError(
                    "dedup minhash: state= (incremental admission) and "
                    "band_batches=/work_dir= (batched full dedup) are "
                    "different modes — pass one or the other"
                )
            if state:
                # incremental admission: data.input is the DELTA, state
                # is a minhash_dedup_batched work dir (same knobs);
                # update_state=false freezes the state for a dry run;
                # admission_id=<crawl-date> makes the run retry-
                # idempotent (overwrite slices — re-running the same id
                # converges instead of double-appending state);
                # corpus_text=<parquet> supplies the original corpus
                # text a slim (store_shingles=false) state recomputes
                # its verify shingles from
                out = minhash_admit(
                    docs,
                    state,
                    update_state=str(
                        knobs.get("update_state", True)
                    ).lower()
                    not in ("false", "0", "no"),
                    admission_id=knobs.get("admission_id"),
                    corpus_text=knobs.get("corpus_text"),
                    **kw,
                )
            elif bb is not None or knobs.get("work_dir"):
                # work_dir= alone selects the batched schedule too (one
                # pass per band): a user who configured scratch wants
                # the bounded-state discipline — silently falling back
                # to the monolithic operator would ignore the knob and
                # spill/OOM at exactly the corpus scale work_dir exists
                # for (review finding, round 8)
                work = knobs.get("work_dir") or (
                    data_c["out"].rstrip("/") + "_work"
                )
                # store_shingles=false drops the _sh arrays from the
                # persisted state (~10x smaller artifact; verify
                # recomputes from text); such a work dir seeds
                # incremental admission (state= mode) with
                # corpus_text= supplying the recompute source
                out = minhash_dedup_batched(
                    docs,
                    work,
                    band_batches=int(bb) if bb is not None else None,
                    store_shingles=str(
                        knobs.get("store_shingles", True)
                    ).lower()
                    not in ("false", "0", "no"),
                    **kw,
                )
            else:
                out = minhash_dedup(docs, **kw)
            out.write.mode("overwrite").parquet(data_c["out"])
            print(f"pairs: {spark.read.parquet(data_c['out']).count()}")
        elif method == "simhash":
            from qualityassurancetool_spark.operators.dedup import (
                simhash_near_dup_pairs,
            )

            out = simhash_near_dup_pairs(
                docs,
                bits=int(knobs.get("bits", 32)),
                bands=int(knobs.get("bands", 4)),
                max_hamming=int(knobs.get("max_hamming", 3)),
            )
            out.write.mode("overwrite").parquet(data_c["out"])
            print(f"pairs: {spark.read.parquet(data_c['out']).count()}")
        elif method == "fingerprint":
            from qualityassurancetool_spark.operators.fingerprint import (
                fingerprint_overlap_pairs,
            )

            out = fingerprint_overlap_pairs(
                docs,
                k=int(knobs.get("k", 20)),
                w=int(knobs.get("w", 8)),
                max_df=int(knobs.get("max_df", 50)),
                min_shared=int(knobs.get("min_shared", 2)),
                # production path: vectorized numpy winnowing (5x the
                # Column extraction; the Column path is the oracle mode)
                strategy="kernel",
            )
            out.write.mode("overwrite").parquet(data_c["out"])
            print(f"pairs: {spark.read.parquet(data_c['out']).count()}")
        elif method == "spans":
            from qualityassurancetool_spark.operators.span_dedup import (
                duplicated_span_dedup,
                duplicated_span_dedup_batched,
            )

            hb = knobs.get("hash_batches")
            if hb is not None or knobs.get("work_dir"):
                # hash_batches=/work_dir= selects the hash-sliced
                # bounded-state schedule (same rule as method=minhash:
                # configured scratch means the user wants the bounded
                # discipline, never a silent fallback)
                out = duplicated_span_dedup_batched(
                    docs,
                    knobs.get("work_dir")
                    or (data_c["out"].rstrip("/") + "_work"),
                    window_tokens=int(knobs.get("window_tokens", 50)),
                    hash_mode="fast",
                    hash_batches=int(hb) if hb is not None else 4,
                )
            else:
                out = duplicated_span_dedup(
                    docs,
                    window_tokens=int(knobs.get("window_tokens", 50)),
                    hash_mode="fast",
                )
            out.write.mode("overwrite").parquet(data_c["out"])
            back = spark.read.parquet(data_c["out"])
            removed = back.agg(
                F.sum("n_tokens_removed").alias("x")
            ).collect()[0]["x"]
            print(f"docs: {back.count()}")
            print(f"tokens_removed: {removed or 0}")
        elif method == "lines":
            from qualityassurancetool_spark.operators.line_dedup import (
                corpus_line_dedup,
            )

            out = corpus_line_dedup(
                docs,
                min_line_chars=int(knobs.get("min_line_chars", 10)),
            )
            out.write.mode("overwrite").parquet(data_c["out"])
            back = spark.read.parquet(data_c["out"])
            removed = back.agg(
                F.sum("n_dup_lines_removed").alias("x")
            ).collect()[0]["x"]
            print(f"docs: {back.count()}")
            print(f"lines_removed: {removed or 0}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_ann(args, overrides: list[str]) -> int:
    """ANN search over an embeddings parquet: fit the chosen index and
    write per-query top-k neighbors.  ``method``:

    - ``brute``: GEMM brute-force cosine (the exactness baseline);
    - ``ivf``: k-means coarse lists, probed-list scan;
    - ``pq``: flat ADC over product-quantized codes;
    - ``ivfadc``: residual PQ over IVF lists (Jégou et al. 2011);
    - ``opq``: learned-rotation PQ (Ge et al. 2013).

    ``prune_batches=true`` (ivfadc): per-Arrow-batch top-k before the
    ranking window — value-exact, and the serving switch at 100 M+
    vectors where the window otherwise sorts every scored probed-list
    row (measured in docs/SCALE.md round-11).

    ``ivfadc`` supports the build-once-serve-many life cycle:
    ``index.out=DIR`` persists the fitted index (cluster_id-partitioned
    ``lists/`` parquet + ``model.json`` centroids/codebooks, optional
    ``index.files_per_list``); ``index.in=DIR`` serves from a persisted
    index — no fit, no encode, and the probed-list filter prunes to the
    probed lists' FILES.  ``index.in=DIR index.append_id=<id>`` is the
    daily-admission tick: ``data.input`` is then the DELTA, encoded
    with the frozen centroids/codebooks into a retry-idempotent
    overwrite slice (re-running the same id converges) and served over
    base + slices in the same invocation.

    Queries default to every ``query_stride``-th corpus vector
    (deterministic, self-contained); point ``queries.input`` at a
    parquet of (query_id, embedding) to search external queries.

    Result contract: for corpus-derived (stride) queries, query ids
    ARE corpus ids and a row with ``neighbor_id == query_id`` (the
    query finding itself) is never returned — brute/ivf exclude it
    natively; the code-based families search at k+1 and the self row
    is filtered + trimmed here.  With ``queries.input`` set the id
    spaces are unrelated, so pq/ivfadc/opq return raw top-k with NO
    self-filter (a coincidental id collision is a legitimate
    neighbor); brute/ivf still exclude collisions inside the operator
    — a note is printed so the assumption is visible.  Every method
    returns exactly k rows per query either way.
    """
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("out"):
        raise ConfigError("missing required settings: data.input, data.out")
    method = knobs.get("method", "brute")
    if method not in ("brute", "ivf", "pq", "ivfadc", "opq"):
        raise ConfigError(
            f"unknown ann method {method!r} (brute|ivf|pq|ivfadc|opq)"
        )
    k = int(knobs.get("k", 10))
    nprobe = int(knobs.get("nprobe", 2))
    n_lists = int(knobs.get("n_lists", 8))
    m = int(knobs.get("m", 4))
    kcode = int(knobs.get("kcode", 16))

    from pyspark.sql import functions as F

    from qualityassurancetool_spark.session import get_spark

    spark = get_spark(run.get("run", {}).get("app_name", "qat-ann"))
    try:
        emb = spark.read.parquet(data_c["input"])
        queries_c = knobs.get("queries", {})
        external_queries = isinstance(queries_c, dict) and bool(
            queries_c.get("input")
        )
        if external_queries:
            queries = spark.read.parquet(queries_c["input"])
            # brute/ivf exclude query_id == vec_id inside the operator,
            # so external query ids are assumed to live in the corpus
            # id space (a collision IS a self-match); the code-based
            # self-filter below is skipped for external queries.
            print(
                "note: queries.input set — query ids colliding with "
                "corpus vec_ids are treated as self-matches by "
                "brute/ivf; pq/ivfadc/opq return raw top-k",
                file=sys.stderr,
            )
        else:
            stride = int(knobs.get("query_stride", 100))
            queries = emb.where(F.col("vec_id") % stride == 0).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
        if method == "brute":
            from qualityassurancetool_spark.operators.similarity import (
                brute_force_topk,
            )

            # brute takes queries keyed like the corpus (it renames to
            # query_id itself); the code-based methods take query_id
            out = brute_force_topk(
                emb,
                queries.withColumnRenamed("query_id", "vec_id"),
                k=k,
                strategy="gemm",
            )
        elif method == "ivf":
            from qualityassurancetool_spark.operators.clustering import (
                kmeans_fit,
            )
            from qualityassurancetool_spark.operators.similarity import (
                ivf_topk,
            )

            cents = kmeans_fit(emb, k=n_lists, max_iter=3)
            cent_df = spark.createDataFrame(
                cents, "cent_id int, cent_vec array<double>"
            )
            # ivf_topk, like brute, takes corpus-keyed queries
            out = ivf_topk(
                emb,
                queries.withColumnRenamed("query_id", "vec_id"),
                cent_df,
                k=k,
                nprobe=nprobe,
            )
        else:
            # code-based families do NOT exclude self-matches natively.
            # For corpus-derived (stride) queries the ids ARE corpus
            # ids: search at k+1, drop the self row, trim back to k by
            # the family's own ranking (adc_dist asc, neighbor asc).
            # For external queries the id spaces are unrelated — a
            # coincidental collision is a legitimate neighbor, so
            # search at k and return raw top-k unfiltered.
            k_search = k if external_queries else k + 1
            if method == "pq":
                from qualityassurancetool_spark.operators.pq import (
                    pq_encode,
                    pq_fit,
                    pq_topk,
                )

                books = pq_fit(emb, m=m, k=kcode, max_iter=3)
                coded = pq_encode(emb, books, strategy="gemm")
                out = pq_topk(coded, queries, books, k=k_search)
            elif method == "ivfadc":
                import json as _json
                import os as _os

                from qualityassurancetool_spark.operators.pq import (
                    ivfadc_fit,
                    ivfadc_index,
                    ivfadc_read,
                    ivfadc_topk,
                    ivfadc_write,
                )

                # index.in / index.out: the build-once-serve-many life
                # cycle — a persisted index is the cluster_id-partitioned
                # inverted-list layout plus a model.json (centroids +
                # codebooks); serving from index.in skips fit AND encode
                # and partition-prunes to the probed lists' files.
                index_c = knobs.get("index", {})
                index_c = index_c if isinstance(index_c, dict) else {}
                if index_c.get("append_id") and not index_c.get("in"):
                    raise SystemExit(
                        "ann: index.append_id needs index.in (the "
                        "persisted index the delta is admitted into)"
                    )
                if index_c.get("in") and index_c.get("out"):
                    if _os.path.realpath(
                        index_c["in"]
                    ) == _os.path.realpath(index_c["out"]):
                        # the serve index is read lazily from in/lists;
                        # an overwrite to the same path would abort
                        # ("cannot overwrite a path that is also being
                        # read from") — and any in+out combo would
                        # re-shuffle and rewrite the whole index, which
                        # is never what a serve run wants
                        raise SystemExit(
                            "ann: index.in == index.out — serving reads "
                            "the layout lazily, so rewriting it in place "
                            "is unsupported; drop index.out to serve, or "
                            "point it at a new path to re-layout"
                        )
                    print(
                        "ann: warning: index.in + index.out rewrites the "
                        "whole index (full shuffle) — intended only for "
                        "re-layout, not serving"
                    )
                if index_c.get("in"):
                    with open(
                        _os.path.join(index_c["in"], "model.json")
                    ) as fh:
                        model = _json.load(fh)
                    cents = [
                        (int(c), [float(x) for x in v])
                        for c, v in model["cents"]
                    ]
                    books = model["books"]
                    n_lists = len(cents)
                    if index_c.get("append_id"):
                        # daily-admission tick: data.input is the DELTA
                        # — encode with the frozen centroids/codebooks
                        # into a retry-idempotent overwrite slice, then
                        # serve over base + slices (ivfadc_read unions
                        # them; same-id rerun converges)
                        from qualityassurancetool_spark.operators.pq import (
                            ivfadc_append,
                        )

                        ivfadc_append(
                            emb,
                            _os.path.join(index_c["in"], "lists"),
                            cents,
                            books,
                            strategy="gemm",
                            append_id=index_c["append_id"],
                        )
                    index = ivfadc_read(
                        spark, _os.path.join(index_c["in"], "lists")
                    )
                else:
                    cents, books = ivfadc_fit(
                        emb, n_lists=n_lists, m=m, k=kcode, max_iter=3
                    )
                    index = ivfadc_index(
                        emb, cents, books, strategy="gemm"
                    )
                if index_c.get("out"):
                    _os.makedirs(index_c["out"], exist_ok=True)
                    ivfadc_write(
                        index,
                        _os.path.join(index_c["out"], "lists"),
                        files_per_list=int(
                            index_c.get("files_per_list", 0)
                        )
                        or None,
                        n_lists=n_lists,
                    )
                    with open(
                        _os.path.join(index_c["out"], "model.json"), "w"
                    ) as fh:
                        _json.dump(
                            {"cents": cents, "books": books}, fh
                        )
                    index = ivfadc_read(
                        spark, _os.path.join(index_c["out"], "lists")
                    )
                # prune_batches=true: serving-at-scale switch — each
                # Arrow batch keeps its k best per query before the
                # ranking window (value-exact; kills the probed-list-
                # sized sort, measured 822 MB spill -> 0 at 100 M
                # vectors in docs/SCALE.md round-11)
                out = ivfadc_topk(
                    index, queries, cents, books, k=k_search,
                    nprobe=nprobe,
                    prune_batches=str(knobs.get("prune_batches", False))
                    .lower() in ("true", "1", "yes"),
                )
            else:  # opq
                from qualityassurancetool_spark.operators.opq import (
                    opq_encode,
                    opq_fit,
                    opq_topk,
                )

                R, books = opq_fit(
                    emb, m=m, k=kcode,
                    opq_iters=int(knobs.get("opq_iters", 2)),
                    lloyd_iters=3,
                )
                coded = opq_encode(emb, R, books)
                out = opq_topk(coded, queries, R, books, k=k_search)
            if not external_queries:
                from pyspark.sql import Window

                w = Window.partitionBy("query_id").orderBy(
                    F.col("adc_dist").asc(), F.col("neighbor_id").asc()
                )
                out = (
                    out.where(F.col("neighbor_id") != F.col("query_id"))
                    .withColumn("_rn", F.row_number().over(w))
                    .where(F.col("_rn") <= k)
                    .drop("_rn")
                )
        out.write.mode("overwrite").parquet(data_c["out"])
        back = spark.read.parquet(data_c["out"])
        print(f"queries: {back.select('query_id').distinct().count()}")
        print(f"results: {back.count()}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_extract(args, overrides: list[str]) -> int:
    """Crawl front end: WARC archives or an HTML-column parquet →
    documents parquet (doc_id, url, text, n_blocks,
    n_boilerplate_blocks).  ``format=warc`` (default; ``data.input``
    is a ``*.warc[.gz]`` glob) or ``format=html`` (parquet with an
    ``html`` column).  Successful 200 text/html responses only in warc
    mode; doc ids are deterministic (md5 of url‖date, 60-bit).
    ``engine=core|justext|trafilatura`` selects the boilerplate
    classifier (justext knobs — ``length_low`` etc. — pass straight
    through)."""
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("out"):
        raise ConfigError("missing required settings: data.input, data.out")
    fmt = knobs.get("format", "warc")
    if fmt not in ("warc", "html"):
        raise ConfigError(f"unknown extract format {fmt!r} (warc|html)")

    from pyspark.sql import functions as F

    from qualityassurancetool_spark.functions.hashing import md5_long
    from qualityassurancetool_spark.operators.html_extract import (
        extract_documents,
    )
    from qualityassurancetool_spark.session import get_spark

    spark = get_spark(run.get("run", {}).get("app_name", "qat-extract"))
    try:
        if fmt == "warc":
            from qualityassurancetool_spark.sources.warc import read_warc

            pages = read_warc(spark, data_c["input"]).where(
                (F.col("http_status") == 200)
                & F.col("content_type").startswith("text/html")
            )
            pages = pages.withColumn(
                "doc_id",
                md5_long(
                    F.concat_ws("\x1f", "url", "warc_date"), salt="warc:"
                ),
            ).select("doc_id", "url", "html")
        else:
            pages = spark.read.parquet(data_c["input"])
        engine = knobs.get("engine", "core")
        engine_kw = {
            k: knobs[k]
            for k in (
                "length_low", "length_high", "stopwords_low",
                "stopwords_high", "max_heading_distance",
            )
            if k in knobs
        }
        # the library now refuses silently-dropped knobs, so only forward
        # what the user actually set; extract_documents routes
        # max_link_density to justext itself and errors on unusable knobs
        named = {}
        if "max_link_density" in knobs:
            named["max_link_density"] = float(knobs["max_link_density"])
        if "min_block_chars" in knobs:
            named["min_block_chars"] = int(knobs["min_block_chars"])
        out = extract_documents(pages, engine=engine, **named, **engine_kw)
        out.write.mode("overwrite").parquet(data_c["out"])
        back = spark.read.parquet(data_c["out"])
        print(f"docs: {back.count()}")
        print(f"nonempty: {back.where(F.length('text') > 0).count()}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_profile(args, overrides: list[str]) -> int:
    """Corpus/shuffle profiling.  ``method``:

    - ``tokens``: exact heavy-hitter tokens over a documents parquet
      (two-pass Misra–Gries; ``min_fraction`` knob);
    - ``skew``: one-row key-skew report for ``key=<column>``;
    - ``pagerank``: authority scores over a (src, dst) edges parquet;
    - ``cms``: Count-Min sketch of the token stream (bounded state;
      ``width``/``depth`` knobs) written as the (row, col, n) cell
      table — merge day sketches downstream with ``cms_merge``;
    - ``badwords``: Aho-Corasick multi-pattern counts per doc
      (``patterns=[...]`` knob, overlapping-occurrence semantics);
    - ``distinct``: per-group HyperLogLog distinct count of
      ``key=<column>`` (``group=<column>``, ``p`` knobs) — flat
      register-table shuffle whatever the key cardinality;
    - ``quantiles``: per-group DDSketch quantiles of
      ``value=<column>`` (``group=<column>``, ``alpha``,
      ``probs=[...]`` knobs) — ±alpha relative-error guarantee,
      bounded cell-table state;
    - ``psi``: dataset-shift report of ``data.input`` vs a reference
      parquet (``ref=<path>`` required; ``cols=[...]`` numeric
      columns, ``category=<col>`` for the categorical variant,
      ``n_bins=``, ``approx=true`` for sketch cut-points — the
      100 TB path) — PSI/KL over reference-quantile bins.
    """
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("out"):
        raise ConfigError("missing required settings: data.input, data.out")
    method = knobs.get("method", "tokens")
    if method not in (
        "tokens", "skew", "pagerank", "cms", "badwords",
        "distinct", "quantiles", "psi",
    ):
        raise ConfigError(
            f"unknown profile method {method!r} "
            "(tokens|skew|pagerank|cms|badwords|distinct|quantiles|psi)"
        )

    from qualityassurancetool_spark.session import get_spark

    spark = get_spark(run.get("run", {}).get("app_name", "qat-profile"))
    try:
        if method == "tokens":
            from qualityassurancetool_spark.operators.heavy_hitters import (
                token_heavy_hitters,
            )
            from qualityassurancetool_spark.schema import load_table

            if data_c.get("table", "parquet") == "documents":
                docs = load_table(spark, data_c["input"], "documents")
            else:
                docs = spark.read.parquet(data_c["input"])
            out = token_heavy_hitters(
                docs, min_fraction=float(knobs.get("min_fraction", 0.002))
            )
        elif method == "psi":
            ref_path = knobs.get("ref")
            if not ref_path:
                raise ConfigError("psi needs ref=<reference parquet>")
            ref = spark.read.parquet(str(ref_path))
            newdf = spark.read.parquet(data_c["input"])
            cat = knobs.get("category")
            if cat:
                from qualityassurancetool_spark.operators.drift_stats import (
                    categorical_stability,
                )

                out = categorical_stability(
                    ref, newdf, str(cat),
                    max_categories=int(
                        knobs.get("max_categories", 100)
                    ),
                )
            else:
                cols = knobs.get("cols")
                if not isinstance(cols, list) or not cols:
                    raise ConfigError(
                        "psi needs cols=[...] or category=<col>"
                    )
                from qualityassurancetool_spark.operators.drift_stats import (
                    population_stability,
                )

                out = population_stability(
                    ref, newdf, [str(c) for c in cols],
                    n_bins=int(knobs.get("n_bins", 10)),
                    approx=str(knobs.get("approx", "")).lower()
                    in ("1", "true"),
                )
        elif method == "skew":
            key = knobs.get("key")
            if not key:
                raise ConfigError("skew profiling needs key=<column>")
            from qualityassurancetool_spark.operators.skew import (
                key_skew_report,
            )

            out = key_skew_report(spark.read.parquet(data_c["input"]), key)
        elif method == "cms":
            from pyspark.sql import functions as F

            from qualityassurancetool_spark.functions.hashing import tokens
            from qualityassurancetool_spark.operators.cms import cms_build
            from qualityassurancetool_spark.schema import load_table

            if data_c.get("table", "parquet") == "documents":
                docs = load_table(spark, data_c["input"], "documents")
            else:
                docs = spark.read.parquet(data_c["input"])
            stream = docs.select(
                F.explode(tokens(F.col("text"))).alias("k")
            ).where(F.length("k") > 0)
            out = cms_build(
                stream,
                "k",
                width=int(knobs.get("width", 2048)),
                depth=int(knobs.get("depth", 4)),
            )
        elif method == "badwords":
            from qualityassurancetool_spark.operators.multipattern import (
                match_counts,
            )
            from qualityassurancetool_spark.schema import load_table

            pats = knobs.get("patterns")
            if not isinstance(pats, list) or not pats:
                raise ConfigError(
                    "badwords profiling needs patterns=[...]"
                )
            if data_c.get("table", "parquet") == "documents":
                docs = load_table(spark, data_c["input"], "documents")
            else:
                docs = spark.read.parquet(data_c["input"])
            out = match_counts(docs, [str(x) for x in pats])
        elif method == "distinct":
            from qualityassurancetool_spark.operators.hll import (
                hll_distinct_by,
            )

            key = knobs.get("key")
            if not key:
                raise ConfigError("distinct profiling needs key=<column>")
            df = spark.read.parquet(data_c["input"])
            group = knobs.get("group")
            out = hll_distinct_by(
                df,
                [group] if group else [],
                key,
                p=int(knobs.get("p", 12)),
            )
        elif method == "quantiles":
            from qualityassurancetool_spark.operators.ddsketch import (
                ddsketch_build,
                ddsketch_quantiles,
            )

            value = knobs.get("value")
            if not value:
                raise ConfigError(
                    "quantiles profiling needs value=<column>"
                )
            df = spark.read.parquet(data_c["input"])
            group = knobs.get("group")
            gcols = [group] if group else []
            alpha = float(knobs.get("alpha", 0.01))
            probs = [
                float(p)
                for p in knobs.get("probs", [0.25, 0.5, 0.75, 0.95])
            ]
            out = ddsketch_quantiles(
                ddsketch_build(df, value, gcols, alpha=alpha),
                probs,
                gcols,
                alpha=alpha,
            )
        else:  # pagerank
            from qualityassurancetool_spark.operators.graph import pagerank

            edges = spark.read.parquet(data_c["input"])
            out = pagerank(
                edges,
                iters=int(knobs.get("iters", 5)),
                damping=float(knobs.get("damping", 0.85)),
            )
        out.write.mode("overwrite").parquet(data_c["out"])
        print(f"rows: {spark.read.parquet(data_c['out']).count()}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_analytics(args, overrides: list[str]) -> int:
    """Event-stream / warehouse analytics.  ``method``:

    - ``funnel``: first-touch ordered funnel over an events parquet
      (``steps=[...]`` required; ``within=``, ``user=``, ``ts=``,
      ``type=``, ``report=true`` for the step table);
    - ``cohort``: acquisition-cohort retention grid
      (``period=week|day|month``);
    - ``growth``: new/retained/resurrected/churned per period
      (``period=week|day``);
    - ``transitions``: first-order event-type transition matrix
      (``order_extra=[...]`` tie-break columns);
    - ``rfm``: recency/frequency/monetary segmentation over an
      orders-shaped parquet (``customer=``, ``date=``, ``amount=``,
      ``n_bins=``, ``approx=true``);
    - ``cooccurrence``: item-item projection of (user, item)
      interactions (``user=``, ``item=``, ``max_per_user=``,
      ``min_count=``);
    - ``ols``: per-group least-squares fit ``y ~ x``
      (``x=``, ``y=``, ``group=[...]``);
    - ``abtest``: variant-vs-control readout (``variant=``,
      ``control=``, ``metric=``, ``kind=mean|proportion``,
      ``by=[...]``, ``alpha=``, optional ``cuped=<covariate>`` to
      CUPED-adjust the metric first — mean kind only);
    - ``control``: control chart over ordered streams
      (``chart=ewma|cusum|seasonal``, ``value=``, ``order=[...]``,
      ``group=[...]``; ewma: ``alpha= window= nsigma=
      min_history=``; cusum: ``slack= threshold= target= sigma=``;
      seasonal: ``ts= period= nsigma= min_samples= loo=true``);
    - ``episodes``: collapse per-row flags into alert incidents
      (``flag=<bool col>``, ``ts=``, ``group=[...]``, ``max_gap=``,
      ``value=<peak col>``, ``min_rows=``).
    """
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if (
        not isinstance(data_c, dict)
        or not data_c.get("input")
        or not data_c.get("out")
    ):
        raise ConfigError("missing required settings: data.input, data.out")
    method = knobs.get("method")
    methods = (
        "funnel", "cohort", "growth", "transitions", "rfm",
        "cooccurrence", "ols", "abtest", "control", "episodes",
    )
    if method not in methods:
        raise ConfigError(
            f"unknown analytics method {method!r} ({'|'.join(methods)})"
        )

    from qualityassurancetool_spark.session import get_spark

    spark = get_spark(run.get("run", {}).get("app_name", "qat-analytics"))
    try:
        df = spark.read.parquet(data_c["input"])
        user = knobs.get("user", "user_id")
        ts = knobs.get("ts", "ts")
        if method == "funnel":
            from qualityassurancetool_spark.operators.funnel import (
                funnel_depth,
                funnel_report,
            )

            steps = knobs.get("steps")
            if not isinstance(steps, list) or not steps:
                raise ConfigError("funnel needs steps=[...]")
            steps = [str(s) for s in steps]
            out = funnel_depth(
                df,
                steps,
                user_col=user,
                type_col=knobs.get("type", "event_type"),
                ts_col=ts,
                within=knobs.get("within"),
            )
            if str(knobs.get("report", "")).lower() in ("1", "true"):
                out = funnel_report(out, steps, user_col=user)
        elif method == "cohort":
            from qualityassurancetool_spark.operators.cohort import (
                cohort_retention,
            )

            out = cohort_retention(
                df, user_col=user, ts_col=ts,
                period=str(knobs.get("period", "week")),
            )
        elif method == "growth":
            from qualityassurancetool_spark.operators.growth import (
                growth_accounting,
            )

            out = growth_accounting(
                df, user_col=user, ts_col=ts,
                period=str(knobs.get("period", "week")),
            )
        elif method == "transitions":
            from qualityassurancetool_spark.operators.transitions import (
                event_transitions,
            )

            extra = knobs.get("order_extra") or []
            out = event_transitions(
                df,
                user_col=user,
                ts_col=ts,
                type_col=knobs.get("type", "event_type"),
                order_extra=[str(c) for c in extra],
            )
        elif method == "rfm":
            from qualityassurancetool_spark.operators.rfm import (
                rfm_segments,
            )

            out = rfm_segments(
                df,
                customer_col=knobs.get("customer", "o_custkey"),
                date_col=knobs.get("date", "o_orderdate"),
                amount_col=knobs.get("amount", "o_totalprice"),
                n_bins=int(knobs.get("n_bins", 5)),
                as_of=knobs.get("as_of"),
                approx=str(knobs.get("approx", "")).lower()
                in ("1", "true"),
            )
        elif method == "cooccurrence":
            from qualityassurancetool_spark.operators.cooccurrence import (
                cooccurrence,
            )

            cap = knobs.get("max_per_user")
            out = cooccurrence(
                df,
                user_col=user,
                item_col=knobs.get("item", "item_id"),
                max_per_user=int(cap) if cap is not None else None,
                min_count=int(knobs.get("min_count", 1)),
            )
        elif method == "ols":
            from qualityassurancetool_spark.operators.regression import (
                grouped_ols,
            )

            x, y = knobs.get("x"), knobs.get("y")
            if not x or not y:
                raise ConfigError("ols needs x=<col> y=<col>")
            group = knobs.get("group") or []
            out = grouped_ols(
                df, str(x), str(y), [str(g) for g in group]
            )
        elif method == "episodes":
            from qualityassurancetool_spark.operators.episodes import (
                flag_episodes,
            )

            flagc, ts = knobs.get("flag"), knobs.get("ts")
            if not flagc or not ts:
                raise ConfigError(
                    "episodes needs flag=<bool col> ts=<timestamp col>"
                )
            group = [str(c) for c in (knobs.get("group") or [])]
            out = flag_episodes(
                df,
                str(flagc),
                str(ts),
                group or None,
                max_gap=knobs.get("max_gap", "1h"),
                value_col=knobs.get("value"),
                min_rows=int(knobs.get("min_rows", 1)),
            )
        elif method == "control":
            value = knobs.get("value")
            order = [str(c) for c in (knobs.get("order") or [])]
            chart = str(knobs.get("chart", "ewma"))
            if not value or (not order and chart != "seasonal"):
                raise ConfigError(
                    "control needs value=<col> order=[...] "
                    "(seasonal: value= ts=)"
                )
            group = [str(g) for g in (knobs.get("group") or [])]
            if chart == "ewma":
                from qualityassurancetool_spark.operators.ewma import (
                    ewma_anomaly,
                )

                out = ewma_anomaly(
                    df, str(value), order, group or None,
                    alpha=float(knobs.get("alpha", 0.3)),
                    window=int(knobs.get("window", 16)),
                    nsigma=float(knobs.get("nsigma", 3.0)),
                    min_history=int(knobs.get("min_history", 4)),
                )
            elif chart == "seasonal":
                from qualityassurancetool_spark.operators.seasonal import (
                    seasonal_zscore,
                )

                ts = knobs.get("ts")
                if not ts:
                    raise ConfigError(
                        "chart=seasonal needs ts=<timestamp col>"
                    )
                out = seasonal_zscore(
                    df, str(value), str(ts), group or None,
                    period=str(knobs.get("period", "hour_of_day")),
                    nsigma=float(knobs.get("nsigma", 3.0)),
                    min_samples=int(knobs.get("min_samples", 5)),
                    loo=str(knobs.get("loo", "")).lower()
                    in ("1", "true"),
                )
            elif chart == "cusum":
                from qualityassurancetool_spark.operators.cusum import (
                    cusum_anomaly,
                )

                tgt, sg = knobs.get("target"), knobs.get("sigma")
                out = cusum_anomaly(
                    df, str(value), order, group or None,
                    target=float(tgt) if tgt is not None else None,
                    sigma=float(sg) if sg is not None else None,
                    slack=float(knobs.get("slack", 0.5)),
                    threshold=float(knobs.get("threshold", 5.0)),
                )
            else:
                raise ConfigError(
                    f"unknown control chart {chart!r} (ewma|cusum|seasonal)"
                )
        else:  # abtest
            from qualityassurancetool_spark.operators.experiment import (
                cuped_adjust,
                two_proportion_z,
                welch_t_test,
            )

            metric = knobs.get("metric")
            control = knobs.get("control")
            if not metric or control is None:
                raise ConfigError(
                    "abtest needs metric=<col> control=<variant>"
                )
            variant = str(knobs.get("variant", "variant"))
            by = [str(g) for g in (knobs.get("by") or [])]
            alpha = float(knobs.get("alpha", 0.05))
            kind = str(knobs.get("kind", "mean"))
            metric = str(metric)
            if kind == "proportion":
                if knobs.get("cuped"):
                    raise ConfigError(
                        "cuped applies to kind=mean only"
                    )
                out = two_proportion_z(
                    df, variant, metric, str(control),
                    by=by or None, alpha=alpha,
                )
            elif kind == "mean":
                cov = knobs.get("cuped")
                if cov:
                    df = cuped_adjust(
                        df, metric, str(cov), by=by or None
                    )
                    metric = f"{metric}_cuped"
                out = welch_t_test(
                    df, variant, metric, str(control),
                    by=by or None, alpha=alpha,
                )
            else:
                raise ConfigError(
                    f"unknown abtest kind {kind!r} (mean|proportion)"
                )
        out.write.mode("overwrite").parquet(data_c["out"])
        print(f"rows: {spark.read.parquet(data_c['out']).count()}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_monitor(args, overrides: list[str]) -> int:
    """Always-on chart → incidents loop (the fused
    ``streaming/incident_chain`` operator) driven from the command
    line: stream ``data.input`` (a parquet dir new files land in), run
    the CUSUM or EWMA recurrence + episode collapse in ONE checkpointed
    stateful query, and last-writer-wins-upsert incident rows keyed
    (stream, episode) into ``data.out``.

    One availableNow pass per invocation — cron it: each run drains
    whatever arrived since the last one and continues the SAME chart +
    open-episode state from ``checkpoint=`` (default
    ``<data.out>_ckpt``).  A crashed-and-retried run converges (the
    sink rewrites the same keys).  Knobs: ``chart=cusum`` (``target=``
    ``sigma=`` required; ``slack=`` ``threshold=``) or ``chart=ewma``
    (``alpha= window= nsigma= min_history=``); ``value= ts= group=``
    column names; ``max_gap= min_rows=`` episode shape;
    ``ts_unit=ns|us|ms|s`` converts an integer ts column to a real
    timestamp first (the driver testdata stores ns-precision longs —
    without it an integer ts is a raw ordering key and ``max_gap``
    compares against µs).

    ``chart=seasonal`` profile lifecycle (round 11):
    ``profile_store=<dir>`` keeps a versioned live profile with a
    persisted tick counter; ``refit_every=N`` re-fits from
    ``history=`` every N ticks (default 1 — a store never silently
    freezes), ``refit_drift=t`` additionally adopts the candidate only
    if a well-sampled cell mean moved >= t old-sigmas
    (:func:`..operators.seasonal.seasonal_profile_refresh`;
    docs/OPERATIONS.md "Profile lifecycle")."""
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if (
        not isinstance(data_c, dict)
        or not data_c.get("input")
        or not data_c.get("out")
    ):
        raise ConfigError("missing required settings: data.input, data.out")
    chart = str(knobs.get("chart", "cusum"))
    if chart not in ("cusum", "ewma", "seasonal"):
        raise ConfigError(
            f"unknown monitor chart {chart!r} (cusum|ewma|seasonal)"
        )
    if chart == "seasonal":
        if not (knobs.get("history") or knobs.get("profile")):
            raise ConfigError(
                "monitor chart=seasonal needs history=<parquet of past "
                "rows to fit the phase profile on> or profile=<stored "
                "seasonal_profile parquet>"
            )
        from qualityassurancetool_spark.operators.seasonal import (
            _PERIODS,
        )

        if str(knobs.get("period", "hour_of_day")) not in _PERIODS:
            # validate BEFORE the session (the config-errors-never-
            # cost-a-session rule above)
            raise ConfigError(
                f"unknown period {knobs.get('period')!r} "
                f"({'|'.join(sorted(_PERIODS))})"
            )
        if knobs.get("profile_store"):
            if not knobs.get("history"):
                raise ConfigError(
                    "profile_store= needs history= (the refit source); "
                    "a frozen baseline is profile= without a store"
                )
            if knobs.get("profile"):
                raise ConfigError(
                    "profile= and profile_store= are mutually "
                    "exclusive: a store manages its own live profile"
                )
            if int(knobs.get("refit_every", 1)) < 1:
                raise ConfigError(
                    f"refit_every must be >= 1, got "
                    f"{knobs.get('refit_every')!r}"
                )
            if "refit_drift" in knobs and float(knobs["refit_drift"]) <= 0:
                raise ConfigError(
                    f"refit_drift must be > 0, got "
                    f"{knobs.get('refit_drift')!r}"
                )
        elif "refit_every" in knobs or "refit_drift" in knobs:
            raise ConfigError(
                "refit_every=/refit_drift= need profile_store= (the "
                "cadence state lives in the store's meta)"
            )
    else:
        # seasonal-only knobs on a cusum/ewma monitor would be
        # SILENTLY ignored — the user would believe a managed baseline
        # lifecycle is running (review finding, round 11)
        stray = [
            k
            for k in ("profile_store", "refit_every", "refit_drift",
                      "history", "profile")
            if k in knobs
        ]
        if stray:
            raise ConfigError(
                f"{'/'.join(s + '=' for s in stray)} only applies to "
                f"chart=seasonal (got chart={chart!r})"
            )
    unit = knobs.get("ts_unit")
    if unit is not None and str(unit) not in ("ns", "us", "ms", "s"):
        # validate BEFORE the session: config errors must never cost
        # (or, under --keep-session, stop) a SparkSession
        raise ConfigError(f"unknown ts_unit {unit!r} (ns|us|ms|s)")

    from qualityassurancetool_spark.session import get_spark
    from qualityassurancetool_spark.streaming.incident_chain import (
        start_incident_upsert,
        streaming_cusum_episodes,
        streaming_ewma_episodes,
    )

    spark = get_spark(run.get("run", {}).get("app_name", "qat-monitor"))
    try:
        import os as _os

        inp = data_c["input"]
        schema = spark.read.parquet(inp).schema
        reader = spark.readStream.schema(schema)
        if _os.path.isfile(inp):
            # the file-stream source wants a DIRECTORY; a single-file
            # table (the driver testdata shape) streams as its parent
            # dir restricted to that one file
            reader = reader.option(
                "pathGlobFilter", _os.path.basename(inp)
            )
            inp = _os.path.dirname(inp)
        stream = reader.parquet(inp)
        ts_col = str(knobs.get("ts", "ts"))
        if unit is not None:
            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            # the same column reads as LONG (nanosAsLong sessions) or
            # TIMESTAMP_NTZ depending on session confs — normalize
            # both (the schema.load_table self-heal, stream-side)
            dtype = dict(
                (f.name, f.dataType) for f in stream.schema.fields
            ).get(ts_col)
            if isinstance(dtype, T.LongType):
                conv = {
                    "ns": F.timestamp_micros(
                        F.expr(f"{ts_col} div 1000")
                    ),
                    "us": F.timestamp_micros(F.col(ts_col)),
                    "ms": F.timestamp_millis(F.col(ts_col)),
                    "s": F.timestamp_seconds(F.col(ts_col)),
                }[str(unit)]
                stream = stream.withColumn(ts_col, conv)
            elif isinstance(dtype, T.TimestampNTZType):
                stream = stream.withColumn(
                    ts_col, F.col(ts_col).cast("timestamp")
                )
        common = dict(
            value_col=str(knobs.get("value", "value")),
            order_col=ts_col,
            group_col=str(knobs.get("group", "stream")),
            max_gap=knobs.get("max_gap", "1h"),
            min_rows=int(knobs.get("min_rows", 1)),
        )
        profile_info = None
        if chart == "cusum":
            if "target" not in knobs or "sigma" not in knobs:
                raise ConfigError("monitor chart=cusum needs target= sigma=")
            incidents = streaming_cusum_episodes(
                stream,
                target=float(knobs["target"]),
                sigma=float(knobs["sigma"]),
                slack=float(knobs.get("slack", 0.5)),
                threshold=float(knobs.get("threshold", 5.0)),
                **common,
            )
        elif chart == "seasonal":
            from qualityassurancetool_spark.operators.seasonal import (
                seasonal_profile,
            )
            from qualityassurancetool_spark.streaming.incident_chain import (
                streaming_seasonal_episodes,
            )

            period = str(knobs.get("period", "hour_of_day"))
            if knobs.get("profile"):
                baseline = spark.read.parquet(str(knobs["profile"]))
            else:
                from pyspark.sql import functions as F
                from pyspark.sql import types as T

                hist = spark.read.parquet(str(knobs["history"]))
                # the same ts_unit self-heal the stream side gets: the
                # history table carries the same integer epoch column
                if unit is not None and isinstance(
                    dict(
                        (f.name, f.dataType) for f in hist.schema.fields
                    ).get(ts_col),
                    T.LongType,
                ):
                    hist = hist.withColumn(
                        ts_col,
                        {
                            "ns": F.timestamp_micros(
                                F.expr(f"{ts_col} div 1000")
                            ),
                            "us": F.timestamp_micros(F.col(ts_col)),
                            "ms": F.timestamp_millis(F.col(ts_col)),
                            "s": F.timestamp_seconds(F.col(ts_col)),
                        }[str(unit)],
                    )
                def _fit(h=hist):
                    return seasonal_profile(
                        h,
                        common["value_col"],
                        common["order_col"],
                        [common["group_col"]],
                        period=period,
                    )

                if knobs.get("profile_store"):
                    from qualityassurancetool_spark.operators.seasonal import (  # noqa: E501
                        seasonal_profile_refresh,
                    )

                    # no cadence knob -> refit every tick (the store
                    # must never DEFAULT to a frozen, ever-staler
                    # baseline; freezing is profile= without a store)
                    baseline, profile_info = seasonal_profile_refresh(
                        spark,
                        str(knobs["profile_store"]),
                        _fit,
                        period=period,
                        refit_every=int(knobs.get("refit_every", 1)),
                        refit_drift=float(knobs["refit_drift"])
                        if "refit_drift" in knobs
                        else None,
                        min_samples=int(knobs.get("min_samples", 5)),
                    )
                else:
                    baseline = _fit()
            incidents = streaming_seasonal_episodes(
                stream,
                baseline,
                period=period,
                nsigma=float(knobs.get("nsigma", 3.0)),
                min_samples=int(knobs.get("min_samples", 5)),
                **common,
            )
        else:
            incidents = streaming_ewma_episodes(
                stream,
                alpha=float(knobs.get("alpha", 0.3)),
                window=int(knobs.get("window", 16)),
                nsigma=float(knobs.get("nsigma", 3.0)),
                min_history=int(knobs.get("min_history", 4)),
                **common,
            )
        ckpt = str(
            knobs.get("checkpoint", data_c["out"].rstrip("/") + "_ckpt")
        )
        q = start_incident_upsert(
            incidents, data_c["out"], ckpt, available_now=True
        )
        q.awaitTermination()
        from qualityassurancetool_spark.functions.fs import path_exists

        # an availableNow run over a glob matching NO files produces
        # zero micro-batches — the sink never writes the path (advisor
        # finding, round 9)
        if profile_info is not None:
            print(
                f"profile: {profile_info['action']} "
                f"(tick {profile_info['tick']}, "
                f"fitted tick {profile_info['fitted_tick']})"
            )
        if not path_exists(spark, data_c["out"]):
            print("incidents: 0")
            print("open: 0")
            return 0
        table = spark.read.parquet(data_c["out"])
        n_open = table.where("open").count()
        print(f"incidents: {table.count()}")
        print(f"open: {n_open}")
        return 0
    finally:
        if not getattr(args, "keep_session", False):
            spark.stop()


def cmd_ml(args, overrides: list[str]) -> int:
    """In-engine model prep / fit / evaluation.  ``method``:

    - ``train``: fit a model over a parquet input and write it as a
      JSON file to ``data.out`` (driver-scale metadata — the model
      IS literals).  ``kind=logreg`` (full-batch GD; ``iters=``,
      ``lr=``, ``l2=``, ``standardize=false``) or ``kind=linear``
      (one-pass normal equations; ``l2=``).  ``features=[...]``,
      ``label=`` required.
    - ``score``: apply a trained model JSON (``model=``) to a
      parquet input; writes the scored parquet to ``data.out``.
    - ``eval``: binary-classifier metrics over a scored parquet
      (``score=``, ``label=``, ``group=[...]``, ``score_bins=``);
      ``thresholds=[...]`` emits the confusion table instead,
      ``pr=true`` the PR curve.
    - ``bin``: equal-frequency discretization (``col=``,
      ``n_bins=``, ``group=[...]``, ``approx=true``).
    """
    import json as _json

    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if (
        not isinstance(data_c, dict)
        or not data_c.get("input")
        or not data_c.get("out")
    ):
        raise ConfigError("missing required settings: data.input, data.out")
    method = knobs.get("method")
    methods = ("train", "score", "eval", "bin")
    if method not in methods:
        raise ConfigError(
            f"unknown ml method {method!r} ({'|'.join(methods)})"
        )

    from qualityassurancetool_spark.session import get_spark

    spark = get_spark(run.get("run", {}).get("app_name", "qat-ml"))
    try:
        df = spark.read.parquet(data_c["input"])
        if method == "train":
            feats = knobs.get("features")
            label = knobs.get("label")
            if not isinstance(feats, list) or not feats or not label:
                raise ConfigError(
                    "train needs features=[...] label=<col>"
                )
            feats = [str(c) for c in feats]
            kind = str(knobs.get("kind", "logreg"))
            if kind == "logreg":
                from qualityassurancetool_spark.operators.logreg import (
                    train_logistic_regression,
                )

                model = train_logistic_regression(
                    df,
                    feats,
                    str(label),
                    iters=int(knobs.get("iters", 50)),
                    lr=float(knobs.get("lr", 1.0)),
                    l2=float(knobs.get("l2", 0.0)),
                    standardize=str(
                        knobs.get("standardize", "true")
                    ).lower()
                    not in ("0", "false"),
                )
            elif kind == "linear":
                from qualityassurancetool_spark.operators.regression import (
                    fit_linear_model,
                )

                model = fit_linear_model(
                    df, feats, str(label),
                    l2=float(knobs.get("l2", 0.0)),
                )
            else:
                raise ConfigError(
                    f"unknown train kind {kind!r} (logreg|linear)"
                )
            model["kind"] = kind
            with open(data_c["out"], "w") as fh:
                _json.dump(model, fh)
            print(f"trained {kind} on n={model['n']}")
            return 0
        if method == "score":
            mpath = knobs.get("model")
            if not mpath:
                raise ConfigError("score needs model=<json path>")
            with open(str(mpath)) as fh:
                model = _json.load(fh)
            if model.get("kind") == "linear":
                from qualityassurancetool_spark.operators.regression import (
                    apply_linear_model,
                )

                out = apply_linear_model(df, model)
            else:
                from qualityassurancetool_spark.operators.logreg import (
                    apply_logistic_regression,
                )

                out = apply_logistic_regression(df, model)
        elif method == "eval":
            from qualityassurancetool_spark.operators.ml_eval import (
                binary_metrics,
                confusion_at_thresholds,
                pr_curve,
            )

            score = str(knobs.get("score", "score"))
            label = str(knobs.get("label", "label"))
            group = [str(g) for g in (knobs.get("group") or [])]
            thresholds = knobs.get("thresholds")
            bins = knobs.get("score_bins")
            if thresholds is not None:
                out = confusion_at_thresholds(
                    df,
                    [float(t) for t in thresholds],
                    score,
                    label,
                    group_cols=group,
                )
            elif str(knobs.get("pr", "")).lower() in ("1", "true"):
                out = pr_curve(
                    df, score, label, group_cols=group,
                    score_bins=int(bins) if bins is not None else None,
                )
            else:
                out = binary_metrics(
                    df, score, label, group_cols=group,
                    score_bins=int(bins) if bins is not None else None,
                )
        else:  # bin
            from qualityassurancetool_spark.operators.feature_prep import (
                quantile_bin,
            )

            col = knobs.get("col")
            if not col:
                raise ConfigError("bin needs col=<col>")
            out = quantile_bin(
                df,
                str(col),
                int(knobs.get("n_bins", 10)),
                group_cols=[str(g) for g in (knobs.get("group") or [])]
                or None,
                approx=str(knobs.get("approx", "")).lower()
                in ("1", "true"),
            )
        out.write.mode("overwrite").parquet(data_c["out"])
        print(f"rows: {spark.read.parquet(data_c['out']).count()}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_pretrain(args, overrides: list[str]) -> int:
    """End-to-end corpus build: documents parquet/JSONL → curate →
    near-dedup → chunk+pack → WebDataset shards + audit report
    (``plans/pretrain``).  Pipeline knobs ride the non-data config
    subtree (``curation.min_quality=…``, ``chunk_tokens=…``)."""
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("out"):
        raise ConfigError("missing required settings: data.input, data.out")

    from qualityassurancetool_spark.plans.pretrain import (
        PretrainConfig,
        run_pretrain_pipeline,
    )
    from qualityassurancetool_spark.session import get_spark

    cfg = PretrainConfig.from_dict(knobs)
    spark = get_spark(run.get("run", {}).get("app_name", "qat-pretrain"))
    try:
        if data_c.get("table", "parquet") == "documents":
            from qualityassurancetool_spark.schema import load_table

            docs = load_table(spark, data_c["input"], "documents")
        elif data_c.get("table") == "jsonl":
            from qualityassurancetool_spark.sources.jsonl import (
                jsonl_ingest_report,
                read_jsonl,
            )

            docs, n_bad = jsonl_ingest_report(
                read_jsonl(spark, data_c["input"])
            )
            print(f"quarantined: {n_bad}")
        else:
            docs = spark.read.parquet(data_c["input"])
        report = run_pretrain_pipeline(docs, cfg, data_c["out"])
        for rule, n in sorted(report["rules"].items()):
            print(f"{rule}: {n}")
        print(f"chunks: {report['n_chunks']}")
        if report["shards"] is not None:
            print(f"shards: {len(report['shards'])}")
            print(f"shard_bytes: {report['shard_bytes']}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_refresh(args, overrides: list[str]) -> int:
    """Incremental corpus refresh (``plans/incremental``): apply one
    full-snapshot update to a state directory — digest diff, curate +
    near-dup-admit ONLY the changed set, roll the seen digests forward.
    Curation knobs ride the non-data config subtree exactly like
    ``curate``.  ``data.finalize_out=…`` additionally chunks+packs+
    shards the current corpus (``pretrain.*`` knobs)."""
    run, knobs = load_run_config(args.config, overrides)
    data_c = run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("state"):
        raise ConfigError("missing required settings: data.input, data.state")

    from qualityassurancetool_spark.plans.curation import CurationConfig
    from qualityassurancetool_spark.plans.incremental import (
        finalize_incremental,
        incremental_update,
    )
    from qualityassurancetool_spark.session import get_spark

    pretrain_knobs = knobs.pop("pretrain", {}) or {}
    cfg = CurationConfig.from_dict(knobs)
    # finalize must re-curate under the SAME rules the admission pass
    # used unless the user explicitly overrides pretrain.curation —
    # otherwise the shards silently follow permissive defaults and the
    # batch-identity guarantee breaks (review finding)
    pretrain_knobs.setdefault("curation", knobs)
    spark = get_spark(run.get("run", {}).get("app_name", "qat-refresh"))
    try:
        if data_c.get("table", "parquet") == "documents":
            from qualityassurancetool_spark.schema import load_table

            docs = load_table(spark, data_c["input"], "documents")
        else:
            docs = spark.read.parquet(data_c["input"])
        report = incremental_update(spark, docs, cfg, data_c["state"])
        print(f"update: {report['update']}")
        for st, n in sorted(report["diff"].items()):
            print(f"{st}: {n}")
        print(f"processed: {report['processed']}")
        print(f"admitted: {report['admitted']}")
        if data_c.get("finalize_out"):
            from qualityassurancetool_spark.plans.pretrain import (
                PretrainConfig,
            )

            frep = finalize_incremental(
                spark,
                data_c["state"],
                PretrainConfig.from_dict(pretrain_knobs),
                data_c["finalize_out"],
            )
            print(f"chunks: {frep['n_chunks']}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_export(args, overrides: list[str]) -> int:
    """The reference's second entry point (``src/aums_data_request.py``):
    fetch a window → best record per rounded second per stream → pivot
    wide → CSV."""
    run, _ = load_run_config(args.config, overrides)
    time_c, data_c = run["time"], run["data"]
    if not isinstance(data_c, dict) or not data_c.get("input") or not data_c.get("csv_out"):
        raise ConfigError("missing required settings: data.input, data.csv_out")

    from pyspark.sql import functions as F

    from qualityassurancetool_spark.operators.pivot_export import pivot_wide
    from qualityassurancetool_spark.session import get_spark
    from qualityassurancetool_spark.sources.sinks import write_csv

    spark = get_spark(run.get("run", {}).get("app_name", "qat-export"))
    try:
        if data_c.get("table", "observations") == "events":
            from qualityassurancetool_spark.schema import (
                events_as_observations,
            )

            obs = events_as_observations(spark, data_c["input"])
        else:
            obs = spark.read.parquet(data_c["input"])
        if time_c.get("start"):
            obs = obs.where(
                F.col("phenomenon_time")
                >= F.lit(_parse_when(time_c["start"], "time.start"))
            )
        if time_c.get("end"):
            obs = obs.where(
                F.col("phenomenon_time")
                < F.lit(_parse_when(time_c["end"], "time.end"))
            )
        stream_col = data_c.get("stream_col", "observation_type")
        streams = data_c.get("streams")
        if not streams:
            # explicit pivot values keep the plan single-pass; when the
            # caller doesn't name them, one metadata-scale distinct pass
            # discovers them (sorted for a deterministic schema)
            streams = sorted(
                r[0] for r in obs.select(stream_col).distinct().collect()
            )
        wide = pivot_wide(obs, streams, stream_col=stream_col)
        write_csv(
            wide, data_c["csv_out"],
            single_file=bool(data_c.get("single_file", False)),
        )
        print(f"exported {len(streams)} stream(s) -> {data_c['csv_out']}")
        return 0
    finally:
        if not args.keep_session:
            spark.stop()


def cmd_validate(args, overrides: list[str]) -> int:
    _, qc_dict = load_run_config(args.config, overrides)
    QCConfig.from_dict(qc_dict)
    print("config OK")
    return 0


def cmd_template(args, overrides: list[str]) -> int:
    from qualityassurancetool_spark.config import write_qc_yaml_template
    from qualityassurancetool_spark.schema import events_as_observations
    from qualityassurancetool_spark.session import get_spark

    spark = get_spark("qat-template")
    try:
        obs = events_as_observations(spark, args.input)
        if args.calibrate:
            import yaml

            from qualityassurancetool_spark.config import (
                suggest_qc_ranges,
            )

            doc = suggest_qc_ranges(
                obs,
                lo=args.lo,
                hi=args.hi,
                margin=args.margin,
                id_col="observation_type",
            )
            with open(args.out, "w") as f:
                yaml.safe_dump(doc, f, sort_keys=False)
        else:
            write_qc_yaml_template(
                obs, args.out, id_col="observation_type"
            )
        print(f"wrote {args.out}")
        return 0
    finally:
        if not getattr(args, "keep_session", False):
            spark.stop()


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="qualityassurancetool_spark",
        description=__doc__.split("\n\n")[0],
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="windowed QC run over a parquet dir")
    p_run.add_argument("-c", "--config", default=None)
    p_run.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_run.add_argument("override", nargs="*", help="key.path=value")

    p_cur = sub.add_parser(
        "curate", help="config-driven curation over a documents parquet"
    )
    p_cur.add_argument("-c", "--config", default=None)
    p_cur.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_cur.add_argument("override", nargs="*", help="key.path=value")

    p_exp = sub.add_parser(
        "export", help="pivoted best-record-per-second CSV export"
    )
    p_exp.add_argument("-c", "--config", default=None)
    p_exp.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_exp.add_argument("override", nargs="*", help="key.path=value")

    p_ddp = sub.add_parser(
        "dedup", help="dedup report (exact|fingerprint|spans|lines|semantic)"
    )
    p_ddp.add_argument("-c", "--config", default=None)
    p_ddp.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_ddp.add_argument("override", nargs="*", help="key.path=value")

    p_pre = sub.add_parser(
        "pretrain",
        help="documents → curate → dedup → chunk+pack → shards",
    )
    p_pre.add_argument("-c", "--config", default=None)
    p_pre.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_pre.add_argument("override", nargs="*", help="key.path=value")

    p_ref = sub.add_parser(
        "refresh",
        help="incremental snapshot refresh into a corpus state dir",
    )
    p_ref.add_argument("-c", "--config", default=None)
    p_ref.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_ref.add_argument("override", nargs="*", help="key.path=value")

    p_ann = sub.add_parser(
        "ann", help="ANN top-k search (brute|ivf|pq|ivfadc|opq)"
    )
    p_ann.add_argument("-c", "--config", default=None)
    p_ann.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_ann.add_argument("override", nargs="*", help="key.path=value")

    p_ext = sub.add_parser(
        "extract", help="WARC/HTML → documents parquet (crawl front end)"
    )
    p_ext.add_argument("-c", "--config", default=None)
    p_ext.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_ext.add_argument("override", nargs="*", help="key.path=value")

    p_prof = sub.add_parser(
        "profile", help="corpus/shuffle profiling (tokens|skew|pagerank|cms|badwords|distinct|quantiles)"
    )
    p_prof.add_argument("-c", "--config", default=None)
    p_prof.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_prof.add_argument("override", nargs="*", help="key.path=value")

    p_ana = sub.add_parser(
        "analytics",
        help=(
            "event/warehouse analytics (funnel|cohort|growth|"
            "transitions|rfm|cooccurrence|ols)"
        ),
    )
    p_ana.add_argument("-c", "--config", default=None)
    p_ana.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_ana.add_argument("override", nargs="*", help="key.path=value")

    p_mon = sub.add_parser(
        "monitor",
        help="always-on chart→incidents loop (fused streaming chain)",
    )
    p_mon.add_argument("-c", "--config", default=None)
    p_mon.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_mon.add_argument("override", nargs="*", help="key.path=value")

    p_ml = sub.add_parser(
        "ml",
        help="in-engine model prep/fit/eval (train|score|eval|bin)",
    )
    p_ml.add_argument("-c", "--config", default=None)
    p_ml.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_ml.add_argument("override", nargs="*", help="key.path=value")

    p_rep = sub.add_parser(
        "report", help="corpus report (dataset-card numbers)"
    )
    p_rep.add_argument("-c", "--config", default=None)
    p_rep.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_rep.add_argument("override", nargs="*", help="key.path=value")

    p_val = sub.add_parser("validate", help="schema-check a config")
    p_val.add_argument("-c", "--config", default=None)
    p_val.add_argument("override", nargs="*")

    p_tpl = sub.add_parser(
        "template", help="emit a per-stream QC YAML skeleton"
    )
    p_tpl.add_argument("--input", required=True)
    p_tpl.add_argument("--out", required=True)
    p_tpl.add_argument(
        "--calibrate", action="store_true",
        help="fill range min/max from observed [lo, hi] DDSketch "
             "quantiles instead of emitting an empty skeleton",
    )
    p_tpl.add_argument("--lo", type=float, default=0.001)
    p_tpl.add_argument("--hi", type=float, default=0.999)
    p_tpl.add_argument("--margin", type=float, default=0.0)
    p_tpl.add_argument(
        "--keep-session", action="store_true", help=argparse.SUPPRESS
    )
    p_tpl.add_argument("override", nargs="*")

    args = parser.parse_args(argv)
    handler = {
        "run": cmd_run,
        "curate": cmd_curate,
        "dedup": cmd_dedup,
        "ann": cmd_ann,
        "extract": cmd_extract,
        "profile": cmd_profile,
        "analytics": cmd_analytics,
        "monitor": cmd_monitor,
        "ml": cmd_ml,
        "report": cmd_report,
        "pretrain": cmd_pretrain,
        "refresh": cmd_refresh,
        "export": cmd_export,
        "validate": cmd_validate,
        "template": cmd_template,
    }[args.command]
    try:
        return handler(args, list(getattr(args, "override", [])))
    except ConfigError as e:
        print(f"config error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
