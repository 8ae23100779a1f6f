"""Scale probe for sessionization + minhash: synthesize a multi-million
row events/documents workload and time the scale-path operators, to back
SCALE.md's claims with measured numbers.

  - sessionization: 10M events over 150k users — one shuffle on user_id,
    work scales with rows-per-core (users >> cores, no straggler group).
  - minhash (fast mode): corpus replicated to ~100k docs — shingles
    exploded once, 16 universal-hash mins per doc, banded join.

Usage: python tools/scale_probe_sessions.py [n_replicas_events] [n_replicas_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.dedup import minhash_dedup
from qualityassurancetool_spark.operators.sessionize import session_stats
from qualityassurancetool_spark.schema import load_table
from qualityassurancetool_spark.session import get_spark


def main() -> None:
    n_rep_ev = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_rep_doc = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("scale-probe-sessions")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    big_ev = (
        ev.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(n_rep_ev - 1))))
        .select(
            (F.col("event_id") * n_rep_ev + F.col("_r")).alias("event_id"),
            # replicas are DISTINCT users: cardinality grows with data,
            # like real traffic (1500 -> 150k users at 100 replicas)
            (F.col("user_id") * n_rep_ev + F.col("_r")).alias("user_id"),
            F.timestamp_micros(
                F.unix_micros("ts") + (F.col("_r") % 7) * 13_000_000
            ).alias("ts"),
            "event_type",
        )
        .repartition(64)
        .persist()
    )
    n = big_ev.count()
    t0 = time.perf_counter()
    out = session_stats(
        big_ev, entity_col="user_id", ts_col="ts", gap="12h",
        order_extra=["event_id"],
    )
    got = out.agg(
        F.count(F.lit(1)).alias("sessions"),
        F.sum("n_events").alias("events"),
    ).collect()[0]
    print(
        f"sessionize: {n:,} rows -> {got['sessions']:,} sessions "
        f"in {time.perf_counter() - t0:.1f}s"
    )
    big_ev.unpersist()

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    big_docs = (
        docs.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(n_rep_doc - 1)))
        )
        .select(
            (F.col("doc_id") * n_rep_doc + F.col("_r")).alias("doc_id"),
            # vary replicas so only intra-replica near-dups pair up
            F.concat(F.col("text"), F.lit(" r"), F.col("_r")).alias("text"),
        )
        .repartition(64)
        .persist()
    )
    nd = big_docs.count()
    t0 = time.perf_counter()
    pairs = minhash_dedup(
        big_docs, num_hashes=16, bands=8, shingle_k=3, threshold=0.5,
        hash_mode="fast",
    )
    np_ = pairs.count()
    print(
        f"minhash fast: {nd:,} docs -> {np_:,} near-dup pairs "
        f"in {time.perf_counter() - t0:.1f}s"
    )
    spark.stop()




def asof_probe(n_rep: int = 100) -> None:
    """Bucketed as-of at scale: dependent 'click' events matched to the
    nearest 'error' event within 60 s over a replicated corpus."""
    spark = get_spark("scale-probe-asof")
    spark.sparkContext.setLogLevel("ERROR")
    from qualityassurancetool_spark.operators.asof import asof_nearest_join
    from qualityassurancetool_spark.schema import events_as_observations

    obs = events_as_observations(spark, "/root/testdata/sf0.1")
    big = (
        obs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(n_rep - 1))))
        .select(
            (F.col("iot_id") * n_rep + F.col("_r")).alias("iot_id"),
            "observation_type",
            F.timestamp_micros(
                F.unix_micros("phenomenon_time") + F.col("_r") * 7_000_000
            ).alias("phenomenon_time"),
            "qc_flag",
        )
        .repartition(64)
        .persist()
    )
    n = big.count()
    dep = big.where(F.col("observation_type") == "click")
    ind = big.where(F.col("observation_type") == "error").select(
        "iot_id", "phenomenon_time", "qc_flag"
    )
    t0 = time.perf_counter()
    out = asof_nearest_join(dep, ind, tolerance=60.0)
    got = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("ind_iot_id").alias("matched"),
    ).collect()[0]
    print(
        f"asof: {n:,} rows ({got['n']:,} dependents, {got['matched']:,} "
        f"matched) in {time.perf_counter() - t0:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "asof":
        asof_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 100)
    else:
        main()
