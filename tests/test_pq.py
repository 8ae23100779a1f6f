"""Product quantization (operators/pq).  Exact-replica oracle:
tools/extra_oracles.py::x_pq."""

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.operators.pq import (
    pq_encode,
    pq_fit,
    pq_topk,
    subspace_bounds,
)
from qualityassurancetool_spark.schema import load_table

M, K = 4, 16


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def books(emb):
    return pq_fit(emb, m=M, k=K, max_iter=3)


def test_subspace_bounds():
    assert subspace_bounds(64, 4) == [(1, 16), (17, 16), (33, 16), (49, 16)]
    with pytest.raises(ValueError):
        subspace_bounds(10, 3)


def test_fit_shapes(books, emb):
    dim = len(emb.select("embedding").head()["embedding"])
    assert len(books) == M
    assert all(len(b) == K for b in books)
    assert all(len(c) == dim // M for b in books for c in b)


def test_encode_codes_in_range(emb, books):
    codes = pq_encode(emb, books)
    row = codes.select("pq_code").head()["pq_code"]
    assert len(row) == M
    stats = codes.select(
        F.min(F.array_min("pq_code")).alias("lo"),
        F.max(F.array_max("pq_code")).alias("hi"),
    ).head()
    assert 0 <= stats["lo"] and stats["hi"] < K
    # codes actually vary (the codebook is used, not collapsed)
    assert codes.select("pq_code").distinct().count() > K


def test_adc_recall_vs_exact(emb, books):
    """PQ is approximate — but its top-10 must overlap the exact
    squared-L2 top-10 substantially on real data."""
    from qualityassurancetool_spark.operators.similarity import l2_sq

    codes = pq_encode(emb, books).persist()
    queries = (
        emb.where(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    approx = pq_topk(codes, queries, books, k=10)
    got = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }
    # exact: crossJoin + l2_sq, same tie-break
    q = queries.select(
        "query_id", F.col("embedding").alias("_qv")
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            l2_sq(F.col("embedding"), F.col("_qv")).alias("d"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("d").asc(), F.col("neighbor_id").asc()
    )
    ex = {
        (r["query_id"], r["neighbor_id"])
        for r in exact.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 10)
        .collect()
    }
    overlap = len(got & ex) / len(ex)
    # synthetic embeddings are ~random — the PQ worst case (no cluster
    # structure for the codebooks to exploit); 4 subspace codes still
    # beat chance (10/500 = 2%) by an order of magnitude
    assert overlap >= 0.2, overlap
    # a query's own vector carries the minimal quantization error —
    # it lands in the ADC top-k for (at least most) queries
    qids = {qid for qid, _ in got}
    own_hits = sum(1 for qid in qids if (qid, qid) in got)
    assert own_hits >= len(qids) - 1
    codes.unpersist()


def test_topk_deterministic_and_sorted(emb, books):
    codes = pq_encode(emb, books)
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = [tuple(r) for r in pq_topk(codes, queries, books, k=5).collect()]
    b = [tuple(r) for r in pq_topk(codes, queries, books, k=5).collect()]
    assert a == b
    per_q = {}
    for qid, nid, d in a:
        per_q.setdefault(qid, []).append(d)
    assert all(ds == sorted(ds) for ds in per_q.values())


def test_ivfadc_end_to_end(emb):
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
        ivfadc_topk,
    )

    cents, books = ivfadc_fit(emb, n_lists=4, m=M, k=K, max_iter=2)
    index = ivfadc_index(emb, cents, books).persist()
    assert index.columns == ["vec_id", "cluster_id", "pq_code"]
    assert index.count() == emb.count()
    n_lists_used = index.select("cluster_id").distinct().count()
    assert 1 < n_lists_used <= 4

    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfadc_topk(index, queries, cents, books, k=5, nprobe=2)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {r["query_id"] for r in queries.collect()}
    for qid, rs in by_q.items():
        ds = [r["adc_dist"] for r in rs]
        assert ds == sorted(ds) and len(rs) <= 5
        # the query's own vector sits in a probed list (its own) and
        # carries only quantization error — it must be found
        assert any(r["neighbor_id"] == qid for r in rs)
    # nprobe=all lists == scoring everything: candidates grow monotonically
    out_all = ivfadc_topk(index, queries, cents, books, k=5, nprobe=4)
    assert out_all.count() == out.count()
    index.unpersist()


def test_gemm_encode_parity(emb, books):
    """The GEMM kernel must agree with the Column oracle path
    row-for-row on real data (float-associativity differences only
    matter on exact distance ties, absent here)."""
    a = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, books).select("vec_id", "pq_code").collect()
    }
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, books, strategy="gemm")
        .select("vec_id", "pq_code")
        .collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        pq_encode(emb, books, strategy="nope")


def test_ivfadc_partitioned_layout(emb, tmp_path):
    """On-disk inverted lists: `ivfadc_write` partitions by cluster_id,
    `ivfadc_topk`'s static probed-list IN literal resolves to
    directory-level PartitionFilters against that layout — search I/O
    tracks nprobe/n_lists, not index size — and the disk search returns
    exactly the in-memory search's rows."""
    import os

    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
        ivfadc_read,
        ivfadc_topk,
        ivfadc_write,
    )

    cents, books = ivfadc_fit(emb, n_lists=4, m=M, k=K, max_iter=2)
    index = ivfadc_index(emb, cents, books)
    path = str(tmp_path / "ivf_index")
    ivfadc_write(index, path)

    # one directory per non-empty list, named by cluster id
    dirs = sorted(
        d for d in os.listdir(path) if d.startswith("cluster_id=")
    )
    lists_used = sorted(
        r["cluster_id"]
        for r in index.select("cluster_id").distinct().collect()
    )
    assert dirs == [f"cluster_id={c}" for c in lists_used]

    disk = ivfadc_read(emb.sparkSession, path)
    assert disk.columns == ["vec_id", "cluster_id", "pq_code"]
    assert disk.schema["cluster_id"].dataType.simpleString() == "int"
    key = lambda rows: sorted(  # noqa: E731
        (r["vec_id"], r["cluster_id"], tuple(r["pq_code"])) for r in rows
    )
    assert key(disk.collect()) == key(index.collect())

    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mem_out = ivfadc_topk(index, queries, cents, books, k=5, nprobe=2)
    disk_out = ivfadc_topk(disk, queries, cents, books, k=5, nprobe=2)
    mkey = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"], round(r["adc_dist"], 9))
        for r in rows
    )
    assert mkey(disk_out.collect()) == mkey(mem_out.collect())

    # the probed-list literal must reach the scan as a partition filter
    plan = disk_out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    ]
    assert scan_lines, plan
    assert any(
        "cluster_id" in ln and "PartitionFilters: []" not in ln
        for ln in scan_lines
    ), "\n".join(scan_lines)


def test_ivfadc_write_files_per_list(emb, tmp_path):
    """`files_per_list` bounds per-list file counts (salted shuffle);
    requires n_lists."""
    import glob
    import os

    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
        ivfadc_read,
        ivfadc_write,
    )

    cents, books = ivfadc_fit(emb, n_lists=4, m=M, k=K, max_iter=2)
    index = ivfadc_index(emb, cents, books)
    path = str(tmp_path / "ivf_salted")
    with pytest.raises(ValueError):
        ivfadc_write(index, path, files_per_list=2)
    ivfadc_write(index, path, files_per_list=2, n_lists=4)
    for d in os.listdir(path):
        if d.startswith("cluster_id="):
            files = glob.glob(os.path.join(path, d, "*.parquet"))
            assert 1 <= len(files) <= 2, (d, files)
    disk = ivfadc_read(emb.sparkSession, path)
    assert disk.count() == index.count()


def test_ivfadc_append_incremental(emb, tmp_path):
    """Append-only maintenance: base write + delta append equals the
    all-at-once index, and search over the appended layout returns the
    same rows as search over a full in-memory index built with the
    same (frozen) centroids/codebooks."""
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_append,
        ivfadc_fit,
        ivfadc_index,
        ivfadc_read,
        ivfadc_topk,
        ivfadc_write,
    )

    base = emb.where(F.col("vec_id") % 5 != 2)
    delta = emb.where(F.col("vec_id") % 5 == 2)
    cents, books = ivfadc_fit(base, n_lists=4, m=M, k=K, max_iter=2)
    path = str(tmp_path / "ivf_incr")
    ivfadc_write(ivfadc_index(base, cents, books), path)
    ivfadc_append(delta, path, cents, books)

    disk = ivfadc_read(emb.sparkSession, path)
    assert disk.count() == emb.count()
    full = ivfadc_index(emb, cents, books)
    key = lambda rows: sorted(  # noqa: E731
        (r["vec_id"], r["cluster_id"], tuple(r["pq_code"])) for r in rows
    )
    assert key(disk.collect()) == key(full.collect())

    queries = delta.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivfadc_topk(disk, queries, cents, books, k=5, nprobe=2)
    b = ivfadc_topk(full, queries, cents, books, k=5, nprobe=2)
    mkey = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"], round(r["adc_dist"], 9))
        for r in rows
    )
    assert mkey(a.collect()) == mkey(b.collect())


def test_ivfadc_append_id_retry_idempotent(emb, tmp_path):
    """append_id= makes index maintenance retry-idempotent: replaying
    the same append overwrites its own slice, ivfadc_read unions base +
    slices to exactly the all-at-once index, and a SECOND distinct
    append id stacks on top (the minhash_admit slice discipline applied
    to the ANN layout, round 9)."""
    import pytest

    from qualityassurancetool_spark.operators.pq import (
        ivfadc_append,
        ivfadc_fit,
        ivfadc_index,
        ivfadc_read,
        ivfadc_write,
    )

    # base must keep vec_id % stride == 0 rows for the stride k-means
    # init (the existing append test's split, cut into two deltas)
    base = emb.where(F.col("vec_id") % 5 != 2)
    d1 = emb.where((F.col("vec_id") % 5 == 2) & (F.col("vec_id") % 10 == 2))
    d2 = emb.where((F.col("vec_id") % 5 == 2) & (F.col("vec_id") % 10 == 7))
    cents, books = ivfadc_fit(base, n_lists=4, m=M, k=K, max_iter=2)
    path = str(tmp_path / "ivf_slices")
    ivfadc_write(ivfadc_index(base, cents, books), path)

    key = lambda df: sorted(  # noqa: E731
        (r["vec_id"], r["cluster_id"], tuple(r["pq_code"]))
        for r in df.collect()
    )
    ivfadc_append(d1, path, cents, books, append_id="2026-08-15")
    once = key(ivfadc_read(emb.sparkSession, path))
    # the cron retry: same id, same delta — byte-identical layout view
    ivfadc_append(d1, path, cents, books, append_id="2026-08-15")
    assert key(ivfadc_read(emb.sparkSession, path)) == once
    assert len(once) == base.count() + d1.count()  # no double rows

    ivfadc_append(d2, path, cents, books, append_id="2026-08-16")
    final = key(ivfadc_read(emb.sparkSession, path))
    assert final == key(ivfadc_index(emb, cents, books))

    with pytest.raises(ValueError, match="append_id"):
        ivfadc_append(d2, path, cents, books, append_id="bad/slash")


def test_ivfadc_read_rejects_unexpected_schema(emb, tmp_path):
    """ivfadc_read identifies the id column by elimination, so a layout
    with extra or missing columns must fail loudly instead of silently
    mis-selecting a positional column as the id."""
    import pytest
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
        ivfadc_read,
        ivfadc_write,
    )

    cents, books = ivfadc_fit(emb, n_lists=2, m=2, k=4, max_iter=2)
    index = ivfadc_index(emb, cents, books)

    extra = str(tmp_path / "extra")
    ivfadc_write(index.withColumn("junk", F.lit(1)), extra)
    with pytest.raises(ValueError, match="exactly one id column"):
        ivfadc_read(emb.sparkSession, extra)

    missing = str(tmp_path / "missing")
    index.drop("pq_code").withColumn("other", F.lit(0.0)).write.partitionBy(
        "cluster_id"
    ).mode("overwrite").parquet(missing)
    with pytest.raises(ValueError, match="not an ivfadc_write layout"):
        ivfadc_read(emb.sparkSession, missing)


def test_ivfadc_index_centroid_lookup_is_id_keyed(emb):
    """The build side must resolve centroids BY ID, like the search
    side: a reordered (or any non-0..n-1-ordered) cents list must
    produce the exact same index as the sorted one — positionally
    indexed residuals silently subtract the wrong centroid (review
    finding, round 8)."""
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
    )

    cents, books = ivfadc_fit(emb, n_lists=4, m=M, k=K, max_iter=2)
    want = {
        (r["vec_id"], r["cluster_id"], tuple(r["pq_code"]))
        for r in ivfadc_index(emb, cents, books).collect()
    }
    shuffled = list(reversed(cents))
    got = {
        (r["vec_id"], r["cluster_id"], tuple(r["pq_code"]))
        for r in ivfadc_index(emb, shuffled, books).collect()
    }
    assert got == want


def test_ivfadc_overwrite_clears_stale_append_slices(emb, tmp_path):
    """A refit rewrite (ivfadc_write mode=overwrite) must also drop the
    ``_appends`` slice root: slices are encoded with the OLD
    centroids/codebooks, and unioning them under a fresh fit yields
    wrong ADC distances and duplicate ids (advisor finding, round 9)."""
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_append,
        ivfadc_fit,
        ivfadc_index,
        ivfadc_read,
        ivfadc_write,
    )

    base = emb.where(F.col("vec_id") % 5 != 2)
    delta = emb.where(F.col("vec_id") % 5 == 2)
    cents, books = ivfadc_fit(base, n_lists=4, m=M, k=K, max_iter=2)
    path = str(tmp_path / "ivf_refit")
    ivfadc_write(ivfadc_index(base, cents, books), path)
    ivfadc_append(delta, path, cents, books, append_id="2026-08-15")
    assert ivfadc_read(emb.sparkSession, path).count() == emb.count()

    # the scheduled refit: new fit over everything, full rewrite
    cents2, books2 = ivfadc_fit(emb, n_lists=4, m=M, k=K, max_iter=2)
    ivfadc_write(ivfadc_index(emb, cents2, books2), path, mode="overwrite")
    disk = ivfadc_read(emb.sparkSession, path)
    # no duplicate ids from a stale slice, codes match the fresh fit
    assert disk.count() == emb.count()
    key = lambda rows: sorted(  # noqa: E731
        (r["vec_id"], r["cluster_id"], tuple(r["pq_code"])) for r in rows
    )
    assert key(disk.collect()) == key(
        ivfadc_index(emb, cents2, books2).collect()
    )


def test_ivfadc_topk_prune_batches_parity(spark, emb):
    """prune_batches (round-11 serving-at-scale switch): per-Arrow-
    batch top-k before the ranking window must be value-exact vs the
    plain window — including under round_digits ties, many small
    batches, and a many-partition index (the regimes where a wrong
    prune comparator would diverge)."""
    from qualityassurancetool_spark.operators.pq import (
        ivfadc_fit,
        ivfadc_index,
        ivfadc_topk,
    )

    cents, books = ivfadc_fit(emb, n_lists=4, m=M, k=K, max_iter=2)
    index = ivfadc_index(emb, cents, books).repartition(16).persist()
    queries = emb.limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["adc_dist"])
        for r in df.collect()
    )
    old_batch = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    try:
        # tiny batches: the prune runs many times per partition and
        # every cross-batch merge path is exercised
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        for rd in (None, 2):
            plain = key(
                ivfadc_topk(
                    index, queries, cents, books, k=5, nprobe=2,
                    round_digits=rd,
                )
            )
            pruned = key(
                ivfadc_topk(
                    index, queries, cents, books, k=5, nprobe=2,
                    round_digits=rd, prune_batches=True,
                )
            )
            assert pruned == plain and len(plain) > 0
            # _rk never leaks into the output schema
            cols = ivfadc_topk(
                index, queries, cents, books, k=5, nprobe=2,
                round_digits=rd, prune_batches=True,
            ).columns
            assert "_rk" not in cols and "_rn" not in cols
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old_batch
        )
    index.unpersist()
