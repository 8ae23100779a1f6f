"""Snapshot diff (operators/snapshot).  Cross-engine parity:
tools/extra_oracles.py::x_snapshot_diff."""

from qualityassurancetool_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_summary,
)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "beta CHANGED"), (5, "epsilon")],
        ["doc_id", "text"],
    )
    d = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert d == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "removed",
        5: "added",
    }
    s = {
        r["status"]: r["n"]
        for r in snapshot_diff_summary(snapshot_diff(old, new)).collect()
    }
    assert s == {"unchanged": 1, "changed": 1, "removed": 2, "added": 1}


def test_snapshot_diff_whitespace_insensitive(spark):
    """Digests are over normalized text — formatting-only edits are
    'unchanged' (re-processing skips them)."""
    old = spark.createDataFrame([(1, "a  b   c")], ["doc_id", "text"])
    new = spark.createDataFrame([(1, " a b c ")], ["doc_id", "text"])
    assert snapshot_diff(old, new).collect()[0]["status"] == "unchanged"


def test_identical_snapshots_all_unchanged(spark, sf_dir):
    from qualityassurancetool_spark.schema import load_table

    docs = load_table(spark, sf_dir, "documents")
    s = {
        r["status"]: r["n"]
        for r in snapshot_diff_summary(snapshot_diff(docs, docs)).collect()
    }
    assert list(s) == ["unchanged"] and s["unchanged"] == docs.count()
