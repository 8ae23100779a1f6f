"""Connected components over a candidate-pair edge list — the follow-on
to LSH pair generation in every production near-dedup pipeline: pairs →
clusters → keep one representative per cluster.  The reference operates at
pandas scale and never needs this step; the algorithm family is public
MapReduce folklore (label propagation with pointer jumping; cf. Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14).

Semantics: each node's cluster id is the MINIMUM node id reachable from it
through the pair graph — deterministic, engine-independent, and exactly
expressible as a recursive SQL oracle (min-reachable-id fixpoint).

Scale design (100 TB):
 - state is one ``(id, comp)`` table with |V| rows, hash-partitioned on
   the node id; edges are symmetrized once and persisted (|2E| rows);
 - each round does one |E|-bounded shuffle (neighbor-min propagation)
   and one |V|-bounded self-join (pointer jump ``comp ← comp[comp]``,
   the doubling step that turns O(diameter) rounds into O(log d));
   near-dup clusters have tiny diameters, so rounds ≈ 2–4 in practice;
 - convergence is detected with a MONOTONE SCALAR: labels only ever
   decrease, so ``sum(comp)`` strictly decreases until the fixpoint —
   one cheap scalar action per round instead of a row-level diff join;
 - the state table is ``localCheckpoint``-ed each round: the pointer
   jump is a SELF-join of the round's state, so without lineage
   TRUNCATION (persist alone does not truncate the logical plan) the
   plan tree doubles per round — exponential analysis cost that OOMs
   the driver after ~8 rounds.  At real cluster scale substitute
   ``checkpoint()`` to cluster-visible storage (same structure, and it
   survives executor loss, which localCheckpoint does not).

This is a genuinely iterative algorithm: the driver loop is control flow,
not data flow — every data-touching step stays a distributed DataFrame op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from qualityassurancetool_spark.operators.graph import (
    _ckpt_rdd_id,
    _free_ckpt,
)


LOCAL_EDGE_THRESHOLD = 1_000_000  # ~16 MB of (long, long) rows on the driver


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "id",
    out_comp: str = "component",
    max_rounds: int = 50,
    strategy: str = "auto",
) -> DataFrame:
    """Cluster nodes of an undirected pair list; returns one row per node
    appearing in any pair: ``(out_id, out_comp)`` where ``out_comp`` is
    the min reachable node id.  Deterministic for any input order.

    ``strategy``: ``"distributed"`` always runs the iterative label
    propagation; ``"local"`` collects the edge list and runs union-find
    on the driver; ``"auto"`` (default) counts the edges and picks —
    verified near-dup pair sets are usually metadata-scale even when the
    corpus is not (a corpus with |pairs| ≳ 10⁶ has a duplication problem
    upstream of clustering), and the distributed path costs 3–4 scheduled
    rounds of joins that dwarf a tiny graph.  Same honest-default
    precedent as the IVF centroid collect: collect what is provably
    small, distribute what is not.  Both paths produce identical labels
    (property-tested against each other)."""
    if strategy not in ("auto", "distributed", "local"):
        raise ValueError(f"unknown strategy {strategy!r}")
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    if strategy == "auto":
        # probe-collect: ONE execution of the (possibly expensive)
        # upstream pair pipeline decides the strategy AND supplies the
        # local path's input; only on overflow does the distributed path
        # re-execute it.  Arrow transfer (toPandas), NOT collect(): 1M
        # (long, long) rows land as two 8 MB columns instead of a million
        # ~100-byte Row objects, so the probe's driver-heap ceiling is
        # the advertised ~16 MB
        probe = e.limit(LOCAL_EDGE_THRESHOLD + 1).toPandas()
        if len(probe) <= LOCAL_EDGE_THRESHOLD:
            return _cc_local(e, probe, out_id, out_comp)
    elif strategy == "local":
        return _cc_local(e, e.toPandas(), out_id, out_comp)
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    lab = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint()
    )
    lab_id = _ckpt_rdd_id(lab)
    prev_sum = lab.agg(F.sum("comp")).first()[0]
    if prev_sum is None:  # empty edge list → empty labeling
        edges.unpersist()
        return lab.select(
            F.col("id").alias(out_id), F.col("comp").alias(out_comp)
        )
    for _ in range(max_rounds):
        # neighbor-min: comp(v) ← min(comp(v), min over u∈N(v) comp(u))
        nmin = (
            edges.join(lab, edges["src"] == lab["id"])
            .groupBy(edges["dst"].alias("id"))
            .agg(F.min("comp").alias("ncomp"))
        )
        cand = (
            lab.join(nmin, lab["id"] == nmin["id"], "left")
            .select(
                lab["id"].alias("id"),
                F.least(
                    lab["comp"], F.coalesce(nmin["ncomp"], lab["comp"])
                ).alias("comp"),
            )
        )
        # pointer jump: comp(v) ← comp(comp(v)) — comp values are node
        # ids, so each has a labeling row; left join is belt-and-braces
        ptr = cand.select(
            F.col("id").alias("jid"), F.col("comp").alias("jcomp")
        )
        new_lab = (
            cand.alias("c")
            .join(ptr.alias("p"), F.col("c.comp") == F.col("p.jid"), "left")
            .select(
                F.col("c.id").alias("id"),
                F.least(
                    F.col("c.comp"),
                    F.coalesce(F.col("p.jcomp"), F.col("c.comp")),
                ).alias("comp"),
            )
            .localCheckpoint()  # truncate lineage: see module docstring
        )
        cur_sum = new_lab.agg(F.sum("comp")).first()[0]
        # new_lab materialized eagerly from lab: the old round's
        # checkpoint blocks are dead — free them now instead of
        # waiting for a driver GC (see graph._free_ckpt)
        _free_ckpt(lab, lab_id)
        lab, lab_id = new_lab, _ckpt_rdd_id(new_lab)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return lab.select(F.col("id").alias(out_id), F.col("comp").alias(out_comp))


def _cc_local(e: DataFrame, pdf, out_id: str, out_comp: str) -> DataFrame:
    """Driver union-find over an Arrow-collected metadata-scale edge
    list (pandas frame), with min-id root selection so labels match the
    distributed path exactly."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(
        pdf.iloc[:, 0].to_list(), pdf.iloc[:, 1].to_list()
    ):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the min-reachable-id invariant
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = [(n, find(n)) for n in parent]
    schema = e.select(
        e.columns[0], F.col(e.columns[0]).alias("_c")
    ).schema
    spark = e.sparkSession
    df = spark.createDataFrame(out, schema=schema)
    return df.select(
        F.col(schema[0].name).alias(out_id), F.col("_c").alias(out_comp)
    )
