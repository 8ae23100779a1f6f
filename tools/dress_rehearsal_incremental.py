"""Incremental-refresh dress rehearsal (VERDICT r4 #4): meter
``plans/incremental`` on a 1M-doc corpus across daily-refresh updates
with 1 % / 5 % / 20 % change volumes — the claim under test is that
per-update cost is proportional to the CHANGE VOLUME (plus one
corpus-size digest scan for the diff, which is the floor any
snapshot-diff design pays), not to corpus size.

Snapshot N edits every (1/f)-th document (suffix revision), removes
0.1 %, and adds 0.1 % new ids — the realistic daily-crawl mix.  Each
update is UI-metered (wall, shuffle, spill) via the corpus rehearsal's
Meter.  Nothing leaves /tmp/dress_incr.

Usage: python tools/dress_rehearsal_incremental.py [n_docs]
       default: 1000000
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

ROOT = "/tmp/dress_incr"


def snapshot(spark, n_docs: int, upd: int, change_pct: float):
    """Snapshot `upd` derived deterministically from the base corpus:
    a `change_pct` fraction revised, 0.1 % removed, 0.1 % added."""
    from tools.dress_rehearsal import corpus

    base = corpus(spark, n_docs)
    if upd == 0:
        return base
    mod = max(int(round(100.0 / change_pct)), 1)
    h = F.crc32(F.concat(F.col("doc_id").cast("string"), F.lit(f":{upd}")))
    revised = F.when(
        h % mod == 0,
        F.concat(F.col("text"), F.lit(f" revision r{upd}")),
    ).otherwise(F.col("text"))
    kept = base.where(
        F.crc32(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":rm{upd}"))
        )
        % 1000
        != 0
    ).select("doc_id", revised.alias("text"))
    added = spark.range(n_docs).select(
        (F.col("id") + n_docs * upd + n_docs).alias("doc_id")
    ).where(F.col("doc_id") % 1000 == 7).select(
        "doc_id",
        F.concat(
            F.lit(f"new document from refresh {upd} body "),
            F.md5(F.col("doc_id").cast("string")),
        ).alias("text"),
    )
    return kept.unionByName(added)


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "1"
    from qualityassurancetool_spark.session import get_spark

    from tools.dress_rehearsal import Meter

    from qualityassurancetool_spark.plans.curation import CurationConfig
    from qualityassurancetool_spark.plans.incremental import (
        incremental_update,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT, exist_ok=True)
    state = os.path.join(ROOT, "state")
    spark = get_spark("dress-incr")
    spark.sparkContext.setLogLevel("ERROR")
    cfg = CurationConfig.from_dict(
        {"max_word_rep_ratio": 0.9, "dedup": "none"}
    )
    print(
        "| stage | rows | wall s | out rows | input MB | shufW MB "
        "| shufR MB | spillM MB | spillD MB |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    m = Meter(spark)
    plan = [(0, 0.0), (1, 1.0), (2, 5.0), (3, 20.0)]
    for upd, pct in plan:
        snap_path = os.path.join(ROOT, f"snap_{upd}")
        snap = snapshot(spark, n, upd, pct)
        m.stage(
            f"snapshot {upd} write ({pct:g}% change)", n,
            lambda s=snap, p=snap_path: s.repartition(32)
            .write.mode("overwrite")
            .parquet(p)
            or n,
        )
        src = spark.read.parquet(snap_path)
        m.stage(
            f"incremental update {upd} ({pct:g}% change)", n,
            lambda s=src: incremental_update(spark, s, cfg, state).get(
                "processed", 0
            ),
        )
    spark.stop()
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
