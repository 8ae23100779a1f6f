"""Dev harness mimicking the driver's correctness gate: run every
``queries()`` entry against its ``oracle_sql()`` in DuckDB at a given sf
and compare row count, column names, and order-insensitive values.
After the declared queries it runs ``tools/extra_oracles.py`` — the
cross-engine checks for scale operators the 50-query cap keeps
undeclared — so one command covers every oracle.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
(a name filter selects among declared AND extra checks; extras are
named ``x_*``)
"""

from __future__ import annotations

import importlib.util
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load_entry():
    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0"  # driver's formatted hash distinguishes -0.0 from 0.0
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            if f == 0.0 and math.copysign(1.0, f) < 0:
                return "-0"
            if f == int(f) and abs(f) < 1e15:
                return str(int(f))
            return f"{f:.6f}"
    except Exception:
        pass
    return str(v)


def frame_to_multiset(cols, rows):
    out = [tuple(norm_cell(v) for v in row) for row in rows]
    return sorted(out)


def canon_spark_type(dt: str) -> str:
    """Spark dtype string → canonical type tag comparable to DuckDB's."""
    dt = dt.lower()
    m = {
        "tinyint": "i8", "smallint": "i16", "int": "i32", "bigint": "i64",
        "float": "f32", "double": "f64", "string": "str", "boolean": "bool",
        "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
        "binary": "bytes",
    }
    if dt in m:
        return m[dt]
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith("array<"):
        return f"list<{canon_spark_type(dt[6:-1])}>"
    return dt


def canon_duck_type(dt: str) -> str:
    """DuckDB DESCRIBE column_type → the same canonical tags.  HUGEINT maps
    to 'i128', which no Spark type produces — the round-1 SUM-promotion
    hash bug surfaces as a type FAIL here before the driver sees it."""
    dt = dt.upper()
    m = {
        "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
        "HUGEINT": "i128", "UTINYINT": "u8", "USMALLINT": "u16",
        "UINTEGER": "u32", "UBIGINT": "u64", "FLOAT": "f32", "REAL": "f32",
        "DOUBLE": "f64", "VARCHAR": "str", "BOOLEAN": "bool",
        "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
        "TIMESTAMP_NS": "ts", "DATE": "date", "BLOB": "bytes",
    }
    if dt in m:
        return m[dt]
    if dt.startswith("DECIMAL"):
        return dt.lower().replace(" ", "")
    if dt.endswith("[]"):
        return f"list<{canon_duck_type(dt[:-2])}>"
    return dt.lower()


def main() -> int:
    if "--list" in sys.argv:
        # print every check name (declared then extras), one per line —
        # for building chunked runs that stay under an outer timeout
        m = load_entry()
        sys.path.insert(0, "/root/repo/tools")
        from extra_oracles import EXTRA_CHECKS

        for name in list(m.queries()) + list(EXTRA_CHECKS):
            print(name)
        return 0
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    m = load_entry()
    sys.path.insert(0, "/root/repo")
    from qualityassurancetool_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = m.queries(), m.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__} {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?   {name}: rows={len(spark_rows)} (no oracle, rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            duck_types = [
                r[1]
                for r in con.execute(
                    f"DESCRIBE (SELECT * FROM ({oracles[name]}) _q)"
                ).fetchall()
            ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__} {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if [c.lower() for c in spark_cols] != [c.lower() for c in duck_cols]:
            problems.append(f"cols spark={spark_cols} duck={duck_cols}")
        else:
            s_types = [canon_spark_type(t) for _, t in sdf.dtypes]
            d_types = [canon_duck_type(t) for t in duck_types]
            for c, st, dk in zip(spark_cols, s_types, d_types):
                if st != dk:
                    problems.append(f"type[{c}] spark={st} duck={dk}")
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if not problems:
            s_ms = frame_to_multiset(spark_cols, spark_rows)
            d_ms = frame_to_multiset(duck_cols, duck_rows)
            if s_ms != d_ms:
                diff_i = next(
                    (i for i, (a, b) in enumerate(zip(s_ms, d_ms)) if a != b),
                    None,
                )
                detail = (
                    f" first-diff@{diff_i}: spark={s_ms[diff_i]} duck={d_ms[diff_i]}"
                    if diff_i is not None
                    else ""
                )
                problems.append("value multiset mismatch" + detail)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK    {name}: rows={len(spark_rows)}")

    failures += run_extras(spark, con, sf_dir, only)
    spark.stop()
    return 1 if failures else 0


def run_extras(spark, con, sf_dir: str, only: set) -> int:
    """Undeclared-operator oracles (tools/extra_oracles.py).  Value
    comparison only (multiset + row count): extras are not driver-hashed,
    so column-type canonicalization is not load-bearing here."""
    sys.path.insert(0, "/root/repo/tools")
    from extra_oracles import EXTRA_CHECKS

    failures = 0
    for name, check in EXTRA_CHECKS.items():
        if only and name not in only:
            continue
        try:
            left, right = check(spark, con, sf_dir)
            if hasattr(left, "collect"):  # (spark_df, duck_sql) shape
                cols = left.columns
                s_rows = [tuple(r) for r in left.collect()]
                res = con.execute(right)
                d_cols = [d[0] for d in res.description]
                d_rows = res.fetchall()
                if [c.lower() for c in cols] != [c.lower() for c in d_cols]:
                    print(f"FAIL  {name}: cols spark={cols} duck={d_cols}")
                    failures += 1
                    continue
            else:  # already-materialized (rows, rows) shape
                s_rows, d_rows = left, right
            s_ms = frame_to_multiset(None, s_rows)
            d_ms = frame_to_multiset(None, d_rows)
            if len(s_rows) != len(d_rows) or s_ms != d_ms:
                diff_i = next(
                    (i for i, (a, b) in enumerate(zip(s_ms, d_ms)) if a != b),
                    None,
                )
                detail = (
                    f" first-diff@{diff_i}: spark={s_ms[diff_i]}"
                    f" duck={d_ms[diff_i]}"
                    if diff_i is not None
                    else f" rowcount {len(s_rows)} vs {len(d_rows)}"
                )
                print(f"FAIL  {name}: value multiset mismatch{detail}")
                failures += 1
            else:
                print(f"OK    {name}: rows={len(s_rows)}")
        except Exception as e:  # noqa: BLE001 - harness boundary
            print(f"FAIL  {name}: {type(e).__name__} {str(e)[:300]}")
            failures += 1
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
