"""`ml` CLI subcommand e2e: train (logreg/linear) -> score -> eval
(metrics / thresholds / PR) and quantile binning over parquet."""

from __future__ import annotations

import json

import pytest

from qualityassurancetool_spark.cli import main


@pytest.fixture()
def labeled_src(spark, tmp_path):
    from pyspark.sql import functions as F

    src = str(tmp_path / "labeled")
    x1 = F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0
    x2 = (
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)) / 1000.0
    )
    spark.range(600).select(
        x1.alias("x1"),
        x2.alias("x2"),
        ((x1 - x2) > 0.1).cast("int").alias("label"),
    ).write.parquet(src)
    return src


def _run(argv):
    rc = main(argv)
    assert rc == 0


def test_train_score_eval_logreg(spark, labeled_src, tmp_path, capsys):
    model = str(tmp_path / "model.json")
    _run([
        "ml", "--keep-session", f"data.input={labeled_src}",
        f"data.out={model}", "method=train", "kind=logreg",
        "features=[x1, x2]", "label=label", "iters=30",
    ])
    m = json.load(open(model))
    assert m["kind"] == "logreg" and len(m["weights"]) == 2
    assert m["weights"][0] > 0 and m["weights"][1] < 0

    scored = str(tmp_path / "scored")
    _run([
        "ml", "--keep-session", f"data.input={labeled_src}",
        f"data.out={scored}", "method=score", f"model={model}",
    ])
    assert "score" in spark.read.parquet(scored).columns

    ev = str(tmp_path / "metrics")
    _run([
        "ml", "--keep-session", f"data.input={scored}",
        f"data.out={ev}", "method=eval",
    ])
    row = spark.read.parquet(ev).collect()[0]
    assert row["auc"] > 0.95
    capsys.readouterr()


def test_train_linear_and_thresholds(spark, labeled_src, tmp_path, capsys):
    model = str(tmp_path / "lin.json")
    _run([
        "ml", "--keep-session", f"data.input={labeled_src}",
        f"data.out={model}", "method=train", "kind=linear",
        "features=[x1, x2]", "label=label", "l2=0.1",
    ])
    m = json.load(open(model))
    assert m["kind"] == "linear" and m["r2"] is not None

    scored = str(tmp_path / "linscored")
    _run([
        "ml", "--keep-session", f"data.input={labeled_src}",
        f"data.out={scored}", "method=score", f"model={model}",
    ])
    assert "prediction" in spark.read.parquet(scored).columns

    conf = str(tmp_path / "conf")
    _run([
        "ml", "--keep-session", f"data.input={scored}",
        f"data.out={conf}", "method=eval", "score=prediction",
        "thresholds=[0.3, 0.5]",
    ])
    out = spark.read.parquet(conf)
    assert out.count() == 2
    assert "f1" in out.columns
    capsys.readouterr()


def test_pr_curve_and_bin(spark, labeled_src, tmp_path, capsys):
    pr = str(tmp_path / "pr")
    _run([
        "ml", "--keep-session", f"data.input={labeled_src}",
        f"data.out={pr}", "method=eval", "score=x1",
        "pr=true", "score_bins=20",
    ])
    prdf = spark.read.parquet(pr)
    assert prdf.count() <= 21 and "recall" in prdf.columns

    binned = str(tmp_path / "binned")
    _run([
        "ml", "--keep-session", f"data.input={labeled_src}",
        f"data.out={binned}", "method=bin", "col=x1", "n_bins=4",
    ])
    bins = {
        r["x1_bin"]
        for r in spark.read.parquet(binned).collect()
    }
    assert bins == {0, 1, 2, 3}
    capsys.readouterr()


def test_ml_validation(tmp_path):
    assert main(["ml", "method=train"]) != 0  # missing data.*
    rc = main([
        "ml", f"data.input={tmp_path}", f"data.out={tmp_path}/o",
        "method=nope",
    ])
    assert rc != 0
