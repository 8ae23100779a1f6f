"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship QC pipeline on sf0.001.
``queries()`` — one entry per implemented operator family (SURVEY.md §2 +
the scale ops), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-runnable ANSI SQL producing the identical result
(same column names, same rounding, same deterministic tie-breaks).

Cross-engine determinism rules used throughout:
- time arithmetic in integer epoch microseconds (exact in both engines);
- money sums through DECIMAL(18,2) then cast to double (exact, order-free);
- float outputs rounded to 6 dp on BOTH sides;
- hashing via md5 only (identical in both engines);
- every ranking has a total deterministic order (explicit id tie-breaks).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qualityassurancetool_spark.flags import flag_merge_sql, flag_merge, flag_from_bool, QualityFlags
from qualityassurancetool_spark.functions.geo import haversine_m, haversine_sql
from qualityassurancetool_spark.functions.timeutils import epoch_micros
from qualityassurancetool_spark.operators.gradient import gradient_column, gradient_sql
from qualityassurancetool_spark.operators.range_check import out_of_range_bool
from qualityassurancetool_spark.operators.zscore import calc_zscore, zscore_sql
from qualityassurancetool_spark.schema import events_as_observations, load_table

# ---------------------------------------------------------------------------
# shared fixtures: per-stream thresholds used by the QC queries (values in
# the spirit of the reference's conf/config.yaml:185-516)
# ---------------------------------------------------------------------------

THRESHOLDS: dict[str, tuple[float, float]] = {
    "click": (1.0, 250.0),
    "purchase": (2.0, 240.0),
    "view": (1.5, 260.0),
    "signup": (0.5, 230.0),
    "error": (1.0, 200.0),
}

EVENT_TYPES = sorted(THRESHOLDS)

THRESHOLDS_SQL_VALUES = ", ".join(
    f"('{k}', {lo}, {hi})" for k, (lo, hi) in sorted(THRESHOLDS.items())
)

# DuckDB CTE mirroring schema.events_as_observations exactly
EVENTS_CTE = """
WITH obs AS (
    SELECT
        event_id            AS iot_id,
        value               AS result,
        ts                  AS phenomenon_time,
        epoch_us(ts)        AS t_us,
        CAST(0 AS TINYINT)  AS qc_flag,
        user_id,
        event_type          AS observation_type,
        51.0 + ((event_id * 7919) % 2000) / 10000.0   AS lat,
        3.0  + ((event_id * 104729) % 2000) / 10000.0 AS long
    FROM events
),
thresholds(observation_type, qc_range_min, qc_range_max) AS (
    VALUES {thr}
)
""".replace("{thr}", THRESHOLDS_SQL_VALUES)


def _obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_observations(spark, sf_dir)


def _thresholds_df(spark: SparkSession) -> DataFrame:
    rows = [(k, lo, hi) for k, (lo, hi) in sorted(THRESHOLDS.items())]
    return spark.createDataFrame(
        rows, "observation_type string, qc_range_min double, qc_range_max double"
    )


# ---------------------------------------------------------------------------
# QC family
# ---------------------------------------------------------------------------


def q_qc_range_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+F1+F2+A1: strict range per stream -> flag merge -> histogram."""
    obs = _obs(spark, sf_dir)
    df = obs.join(F.broadcast(_thresholds_df(spark)), "observation_type", "left")
    new_flag = flag_from_bool(
        out_of_range_bool(F.col("result"), F.col("qc_range_min"), F.col("qc_range_max")),
        flag_on_true=QualityFlags.BAD,
    )
    df = df.withColumn("qc_flag", flag_merge(F.col("qc_flag"), new_flag))
    return (
        df.groupBy("observation_type", F.col("qc_flag").cast("int").alias("flag"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("observation_type", "flag")
    )


SQL_QC_RANGE_FLAGS = EVENTS_CTE + f"""
, flagged AS (
    SELECT o.observation_type,
           {flag_merge_sql(
               'o.qc_flag',
               "CASE WHEN NOT (o.result > t.qc_range_min AND o.result < t.qc_range_max) THEN 4 ELSE 0 END"
           )} AS qc_flag
    FROM obs o LEFT JOIN thresholds t USING (observation_type)
)
SELECT observation_type, CAST(qc_flag AS INT) AS flag, COUNT(*) AS n
FROM flagged
GROUP BY observation_type, qc_flag
ORDER BY observation_type, flag
"""


def q_qc_gradient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: np.gradient-parity time derivative per stream."""
    obs = _obs(spark, sf_dir)
    g = gradient_column("result", "phenomenon_time", ["observation_type"], ["iot_id"])
    return obs.select(
        "iot_id", F.round(g, 6).alias("gradient_r")
    ).orderBy("iot_id")


SQL_QC_GRADIENT = EVENTS_CTE + f"""
SELECT iot_id,
       round({gradient_sql('result', 't_us', 'observation_type', 't_us, iot_id')}, 6) AS gradient_r
FROM obs
ORDER BY iot_id
"""


def q_qc_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: rolling 60-min trailing z-score per stream."""
    obs = _obs(spark, sf_dir)
    z = calc_zscore(
        obs, group_col="observation_type", rolling_time_window="60min"
    )
    return z.select("iot_id", F.round("zscore", 6).alias("zscore_r")).orderBy(
        "iot_id"
    )


SQL_QC_ZSCORE = EVENTS_CTE + f"""
SELECT iot_id,
       round({zscore_sql('result', 't_us', 'observation_type', 3600.0)}, 6) AS zscore_r
FROM obs
ORDER BY iot_id
"""


def q_qc_flag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 on the full range-checked table (global flag histogram)."""
    df = q_qc_range_flags(spark, sf_dir)
    return (
        df.groupBy("flag").agg(F.sum("n").alias("n_total")).orderBy("flag")
    )


SQL_QC_FLAG_HISTOGRAM = (
    "WITH sub AS (" + SQL_QC_RANGE_FLAGS + ")\n"
    "SELECT flag, SUM(n) AS n_total FROM sub GROUP BY flag ORDER BY flag"
)


def q_distinct_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: distinct stream inventory with row counts and emptiness guard."""
    obs = _obs(spark, sf_dir)
    return (
        obs.groupBy("observation_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("iot_id").alias("n_ids"),
            F.round(F.min("result"), 6).alias("min_result"),
            F.round(F.max("result"), 6).alias("max_result"),
        )
        .orderBy("observation_type")
    )


SQL_DISTINCT_STREAMS = EVENTS_CTE + """
SELECT observation_type,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT iot_id) AS n_ids,
       round(MIN(result), 6) AS min_result,
       round(MAX(result), 6) AS max_result
FROM obs
GROUP BY observation_type
ORDER BY observation_type
"""


# ---------------------------------------------------------------------------
# relational coverage (scans, broadcast joins, aggs, top-k, sorts)
# ---------------------------------------------------------------------------


def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family sweep on lineitem: grouped sums/avgs/counts (decimal-exact
    money sums so parallel summation is order-free)."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_AGG_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       round(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-style broadcast join fact×dim + grouped agg: revenue by market
    segment and order status."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == cust["c_custkey"],
    )
    return (
        j.groupBy("c_mktsegment", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment", "o_orderstatus")
    )


SQL_JOIN_SEGMENT_REVENUE = """
SELECT c.c_mktsegment, o.o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment, o.o_orderstatus
ORDER BY c.c_mktsegment, o.o_orderstatus
"""


def q_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/O2: top-3 orders by totalprice per market segment (deterministic
    orderkey tie-break)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == cust["c_custkey"],
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rk")
    )


SQL_TOPK_ORDERS_PER_SEGMENT = """
SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
    SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
           row_number() OVER (PARTITION BY c.c_mktsegment
                              ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rk
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rk <= 3
ORDER BY c_mktsegment, rk
"""


def q_nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dim broadcast join chain: supplier→nation→region with
    account-balance rollup (tiny dims, pure broadcast)."""
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    j = sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]).join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    )
    return (
        j.groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


SQL_NATION_REGION_ROLLUP = """
SELECT r.r_name,
       COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: QC range pipeline flag histogram on sf0.001."""
    return q_qc_range_flags(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "qc_range_flags": q_qc_range_flags,
        "qc_gradient": q_qc_gradient,
        "qc_zscore": q_qc_zscore,
        "qc_flag_histogram": q_qc_flag_histogram,
        "distinct_streams": q_distinct_streams,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_segment_revenue": q_join_segment_revenue,
        "topk_orders_per_segment": q_topk_orders_per_segment,
        "nation_region_rollup": q_nation_region_rollup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "qc_range_flags": SQL_QC_RANGE_FLAGS,
        "qc_gradient": SQL_QC_GRADIENT,
        "qc_zscore": SQL_QC_ZSCORE,
        "qc_flag_histogram": SQL_QC_FLAG_HISTOGRAM,
        "distinct_streams": SQL_DISTINCT_STREAMS,
        "agg_pricing_summary": SQL_AGG_PRICING_SUMMARY,
        "join_segment_revenue": SQL_JOIN_SEGMENT_REVENUE,
        "topk_orders_per_segment": SQL_TOPK_ORDERS_PER_SEGMENT,
        "nation_region_rollup": SQL_NATION_REGION_ROLLUP,
    }
