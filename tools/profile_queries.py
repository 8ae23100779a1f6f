"""Per-query profiling for the optimization rounds: separates DRIVER
plan-build time (DataFrame construction, py4j traffic, any collects the
build path performs) from EXECUTION time (the ``count()`` action the
bench times), and optionally dumps ``explain("formatted")`` per query.

Usage:
    python tools/profile_queries.py [--explain-dir DIR] [--iters N] [query ...]

Writes one line per query:  name  build_s  exec_s  total_s  rows
and a JSON blob at the end.  Uses the same session/table warm-up as
bench.py so numbers are comparable to warm bench medians.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entrymod", os.path.join(repo, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    import bench as benchmod  # noqa: F401  (for BENCH_QUERIES)
    from qualityassurancetool_spark.session import get_spark
    from qualityassurancetool_spark.schema import load_table

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    names = args.queries or list(benchmod.BENCH_QUERIES)

    for t in ("region", "events", "documents", "embeddings", "lineitem"):
        load_table(spark, args.sf_dir, t).count()
    # untimed warm pass (JIT/codegen), same as bench.py
    for name in names:
        qs[name](spark, args.sf_dir).count()

    out = {}
    print(f"{'query':28} {'build_s':>8} {'exec_s':>8} {'total_s':>8} rows")
    for name in names:
        builds, execs, rows = [], [], 0
        for _ in range(args.iters):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            rows = df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b = statistics.median(builds)
        e = statistics.median(execs)
        out[name] = {"build_s": round(b, 3), "exec_s": round(e, 3),
                     "total_s": round(b + e, 3), "rows": rows}
        print(f"{name:28} {b:8.3f} {e:8.3f} {b + e:8.3f} {rows}")
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf_dir)
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
