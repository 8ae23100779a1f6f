"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

MEASUREMENT FIX, round 12 (guide §1.4; VERDICT r11 items 2/4): the timed
action is now the NOOP SINK (``df.write.format("noop")``), which computes
every column of every row, instead of ``count()``, which let the optimizer
prune columns and whole subtrees (proven concretely by resample in round
11: its windows+join never executed under count()).  The headline
``value``/``queries`` are noop-sink medians; the OLD count()-action
numbers are still measured and recorded under ``count_action`` for one
round so cross-round comparisons stay apples-to-apples (r11 and earlier
headline numbers are count-action).  Disable the compat pass with
``SPARK_GRAFT_BENCH_COUNT=0``.

Stability: each query runs ``$SPARK_GRAFT_BENCH_ITERS`` times (default 3,
back-to-back so iterations 2+ are warm) and reports the per-query MEDIAN;
the headline value is the sum of medians.  Cold-JVM/codegen variance was
the dominant driver-vs-local gap in round 2 (2.4-2.6x on the two heaviest
dedup queries, same plans) — medians of warm runs measure the plan, not
the JIT.  Per-query FIRST-run wall (one-time cached-frame builds + JIT)
is recorded as ``cold_s`` with its sum in ``cold_total``, so one-time
work excluded from warm medians stays driver-visible.
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "qc_full_pipeline",
    "qc_reference_chain",
    "qc_range_flags",
    "qc_gradient",
    "qc_zscore",
    "qc_asof_dependent",
    "qc_depth_flags",
    "qc_spatial_outlier",
    "qc_stabilization",
    "pivot_export",
    "shipping_priority",
    "lang_quality_rollup",
    "curation_pipeline",
    "dedup_signatures",
    "dedup_clusters",
    "decontaminate_overlap",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "sim_topk",
    "text_quality_filters",
    "sample_stratified",
    # round-5 promoted flagships (driver-gate rows since r5)
    "bm25",
    "cms",
    "multipattern",
    # round-5 second swap: hll/ddsketch replace the retired
    # price_percentiles/events_profile rows (covered as x_* extras)
    "hll_distinct",
    "ddsketch_quantiles",
    # round-5 third swap: funnel/cohort replace the retired
    # qc_flag_histogram/unique_value_assert rows (covered as x_*)
    "funnel",
    "cohort",
    # round-5 fourth swap: ml_eval/linreg replace the retired
    # paged_scan/nearest_lookup rows (covered as x_*)
    "ml_eval",
    "linreg",
    # round-6 swap: ewma/experiment/ann_ivfadc replace the retired
    # text_stats/nested_flatten/frame_sample_plan rows and the brute
    # ANN arm (all covered as x_*); ann_ivfadc is the 100 TB ANN shape
    "ewma",
    "experiment",
    "ann_ivfadc",
    # round-7 swap: cusum/seasonal/psi (the monitoring family) replace
    # the retired unpivot_roundtrip/agg_pricing_summary/
    # join_segment_revenue rows (all covered as x_*)
    "cusum",
    "seasonal",
    "psi",
    # round-8 swap: episodes (incident collapse, the monitoring story's
    # operational half) replaces the retired rollup_revenue row
    "episodes",
    # round-9 swap: resample/heavy_hitters_by replace the retired
    # windowed_flag_rollup/downsample_transfer rows (covered as x_*)
    "resample",
    "heavy_hitters_by",
    # round-10 swap: simhash_pairs/isotonic replace the retired
    # topk_orders_per_segment/qc_region_lookup rows (covered as x_*)
    "simhash_pairs",
    "isotonic",
    # round-11 swap: maxsim/kcore replace the retired
    # sessionize_events/dedup_ngram_jaccard rows (covered as x_*)
    "maxsim",
    "kcore",
    # round-12 restoration (VERDICT r11 item 1): the round-11 build
    # phase's retirement of these two dropped them from the declared
    # gate; nothing caps the gate at 50, so they return ALONGSIDE
    # maxsim/kcore (45 bench rows, 52 declared)
    "sessionize_events",
    "dedup_ngram_jaccard",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(os.path.dirname(os.path.abspath(__file__)), "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from qualityassurancetool_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = m.queries()
    timings: dict[str, float] = {}
    # warm the JVM, codegen, and parquet footer caches so the first timed
    # query isn't charged session startup costs
    from qualityassurancetool_spark.schema import load_table

    for t in ("region", "events", "documents", "embeddings", "lineitem"):
        load_table(spark, sf_dir, t).count()

    # One untimed pass over the FULL query set before any timing: the
    # round-3 driver run showed the first bench slots absorbing
    # session-wide JIT/codegen warm-up (qc_full_pipeline read 2.77 s
    # driver vs 0.57 s local median with an unchanged plan).  Table
    # counts alone don't warm the codegen paths each query exercises;
    # executing every query once does, so slot order stops mattering.
    # The warm-up pass doubles as the COLD-cost record: several queries
    # amortize a one-time build into their first run (bm25's persisted
    # token frame, the shared minhash verified-pairs frame behind
    # dedup_minhash_lsh + dedup_clusters, the ann_ivfadc disk layout) —
    # their warm medians below would otherwise read as the full cost of
    # a single cold invocation.  cold_s also carries session-wide JIT/
    # codegen warm-up (that's what this pass exists to absorb), so it is
    # an upper bound on the one-time build, not a pure build time.
    def run_noop(df) -> int:
        # guide §1.4: computes EVERY column of EVERY row, prunes nothing
        df.write.format("noop").mode("overwrite").save()
        return -1

    def run_count(df) -> int:
        return df.count()

    t_warm = time.perf_counter()
    cold: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        run_noop(qs[name](spark, sf_dir))
        cold[name] = round(time.perf_counter() - t0, 3)
    print(
        f"# warm-up pass: {time.perf_counter() - t_warm:.1f}s "
        f"(untimed; per-query first-run costs recorded as cold_s)",
        file=sys.stderr,
    )

    def timed_pass(
        directory: str, iters: int, action
    ) -> tuple[float, dict, dict]:
        tm: dict[str, float] = {}
        bm: dict[str, float] = {}
        tot = 0.0
        tag = action.__name__.removeprefix("run_")
        for name in BENCH_QUERIES:
            fn = qs[name]
            samples = []
            builds = []
            n = 0
            for _ in range(iters):
                t0 = time.perf_counter()
                df = fn(spark, directory)
                builds.append(time.perf_counter() - t0)
                n = action(df)
                samples.append(time.perf_counter() - t0)
            dt = statistics.median(samples)
            tm[name] = round(dt, 3)
            # driver plan-construction share of the row (the per-query
            # split VERDICT r11 item 7 asked to surface): queries stay
            # whole-wall for cross-round comparability, build_s rides
            # alongside
            bm[name] = round(statistics.median(builds), 3)
            tot += dt
            print(
                f"# {name} [{tag}]: median {dt:.3f}s over {iters} "
                f"(min {min(samples):.3f} max {max(samples):.3f}) "
                f"build {bm[name]:.3f}s rows={n}",
                file=sys.stderr,
            )
        return tot, tm, bm

    iters = max(int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3")), 1)
    with_count = os.environ.get("SPARK_GRAFT_BENCH_COUNT", "1") != "0"
    total, timings, builds = timed_pass(sf_dir, iters, run_noop)
    count_block = None
    if with_count:
        total_c, timings_c, _ = timed_pass(sf_dir, iters, run_count)
        count_block = {
            "value": round(total_c, 3),
            "queries": timings_c,
            "iters": iters,
        }

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    payload = {
        "metric": "headline-queries total wall clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # round 12: the timed action behind value/queries (guide §1.4)
        "action": "noop",
        # first-run wall per query (includes any one-time cached-frame
        # build AND session JIT warm-up; see the warm-up pass comment)
        "cold_s": cold,
        "cold_total": round(sum(cold.values()), 3),
        # per-query driver plan-build medians from the noop pass
        "build_s": builds,
        "sf": float(sf) if sf else None,
        "iters": iters,
    }
    if count_block is not None:
        # the pre-round-12 methodology (count() action), kept for one
        # round so r11-vs-r12 comparisons stay apples-to-apples
        payload["count_action"] = count_block

    # sf1 calibration pass (VERDICT r5 #9): the plans only
    # differentiate under 10x data, so the gate artifact records both
    # scales.  /tmp/sf1 is synthesized from sf0.1 by tools/make_sf1.py
    # (disjoint key spaces, distinct content); regenerated if missing.
    # Disable with SPARK_GRAFT_BENCH_SF1=0.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0":
        try:
            if not os.path.exists(
                os.path.join(sf1_dir, "lineitem.parquet")
            ):
                import subprocess

                print("# synthesizing sf1 ...", file=sys.stderr)
                subprocess.run(
                    [
                        sys.executable,
                        os.path.join(
                            os.path.dirname(os.path.abspath(__file__)),
                            "tools",
                            "make_sf1.py",
                        ),
                        sf_dir,
                        sf1_dir,
                    ],
                    check=True,
                    timeout=900,
                )
            t_w1 = time.perf_counter()
            cold1: dict[str, float] = {}
            for name in BENCH_QUERIES:
                t0 = time.perf_counter()
                run_noop(qs[name](spark, sf1_dir))
                cold1[name] = round(time.perf_counter() - t0, 3)
            print(
                f"# sf1 warm-up pass: "
                f"{time.perf_counter() - t_w1:.1f}s (untimed)",
                file=sys.stderr,
            )
            iters1 = max(
                int(os.environ.get("SPARK_GRAFT_BENCH_SF1_ITERS", "2")),
                1,
            )
            total1, timings1, builds1 = timed_pass(sf1_dir, iters1, run_noop)
            payload["sf1"] = {
                "value": round(total1, 3),
                "queries": timings1,
                "action": "noop",
                "cold_s": cold1,
                "cold_total": round(sum(cold1.values()), 3),
                "build_s": builds1,
                "iters": iters1,
                "dir": sf1_dir,
            }
            if with_count:
                total1c, timings1c, _ = timed_pass(
                    sf1_dir, iters1, run_count
                )
                payload["sf1"]["count_action"] = {
                    "value": round(total1c, 3),
                    "queries": timings1c,
                    "iters": iters1,
                }
        except Exception as e:  # sf1 is calibration, never a gate abort
            print(f"# sf1 pass skipped: {e!r}", file=sys.stderr)

    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
