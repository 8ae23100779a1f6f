"""CLI surface (reference ``python src/main.py time.start=... ...`` via
Hydra — ``src/main.py:280``, ``README.adoc:126-131``): dotted-override
parsing golden tests, validate/run commands, end-to-end flags output."""

from __future__ import annotations

import datetime as dt

import pytest
import yaml

from qualityassurancetool_spark.cli import (
    apply_overrides,
    load_run_config,
    main,
    parse_override,
)
from qualityassurancetool_spark.config import ConfigError


def test_parse_override_golden():
    # golden table: token → (path, typed value), OmegaConf-style typing
    cases = [
        ("time.start=2023-01-01T00:00:00",
         (["time", "start"], dt.datetime(2023, 1, 1))),
        ("location.max_velocity=12.5", (["location", "max_velocity"], 12.5)),
        ("a.b.c=3", (["a", "b", "c"], 3)),
        ("feature_flags=true", (["feature_flags"], True)),
        ("x=null", (["x"], None)),
        ("ids=[1, 2, 3]", (["ids"], [1, 2, 3])),
        ("name=plain string", (["name"], "plain string")),
        ("empty=", (["empty"], "")),
    ]
    for token, expected in cases:
        assert parse_override(token) == expected, token


def test_parse_override_errors():
    with pytest.raises(ConfigError, match="key.path=value"):
        parse_override("no-equals-here")
    with pytest.raises(ConfigError, match="empty key"):
        parse_override("=5")


def test_apply_overrides_merge_and_conflict():
    base = {"time": {"start": "a", "window": "10min"}, "QC_global": {}}
    out = apply_overrides(
        base, ["time.start=2023-01-01", "time.overlap=50min",
               "QC_global.range.min=0"]
    )
    assert out["time"] == {
        "start": dt.date(2023, 1, 1), "window": "10min", "overlap": "50min",
    }
    assert out["QC_global"] == {"range": {"min": 0}}
    assert base["time"]["start"] == "a"  # pure — input untouched
    with pytest.raises(ConfigError, match="not a mapping"):
        apply_overrides({"time": {"window": "10min"}}, ["time.window.x=1"])


def test_load_run_config_splits_sections(tmp_path):
    p = tmp_path / "qc.yaml"
    p.write_text(yaml.safe_dump({
        "time": {"window": "10min"},
        "QC": [{"id": "click", "range": {"min": 0, "max": 100}}],
    }))
    run, qc = load_run_config(str(p), ["data.input=/x", "time.overlap=5min"])
    assert run["time"] == {"window": "10min", "overlap": "5min"}
    assert run["data"] == {"input": "/x"}
    assert "time" not in qc and "data" not in qc
    assert qc["QC"][0]["id"] == "click"


def test_validate_command(tmp_path, capsys):
    p = tmp_path / "qc.yaml"
    p.write_text(yaml.safe_dump(
        {"QC": [{"id": "click", "range": {"min": 0, "max": 100}}]}
    ))
    assert main(["validate", "-c", str(p)]) == 0
    assert "config OK" in capsys.readouterr().out
    # an override can break it → exit 2 with a pointed message
    assert main(["validate", "-c", str(p), "QC_global.range.min=5",
                 "QC_global.range.max=1"]) == 2
    assert "min 5 > max 1" in capsys.readouterr().err


def test_run_missing_settings_is_pointed(tmp_path, capsys):
    assert main(["run"]) == 2
    err = capsys.readouterr().err
    for k in ("time.start", "time.end", "data.input", "data.flags_out"):
        assert k in err


def test_run_no_config_file(spark, tmp_path, capsys):
    """A bare run (no YAML, no per-stream rules) must not crash: the
    thresholds dimension is empty, every flag stays NO_QC."""
    flags_out = str(tmp_path / "flags0")
    rc = main([
        "run", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=events",
        f"data.flags_out={flags_out}",
        "time.start=2024-01-01T00:00:00", "time.end=2024-01-02T00:00:00",
        "time.window=720min",
    ])
    assert rc == 0
    assert "ran 2 window(s)" in capsys.readouterr().out
    assert spark.read.parquet(flags_out).count() > 0


def test_run_end_to_end(spark, sf_dir, tmp_path, capsys):
    """Windowed QC run over the events table: 2 days in 1-day windows,
    flags land partitioned by date, BAD count matches the range rule."""
    flags_out = str(tmp_path / "flags")
    cfg = tmp_path / "qc.yaml"
    cfg.write_text(yaml.safe_dump({
        "QC": [
            {"id": t, "range": {"min": 0.0, "max": 400.0}}
            for t in ["click", "purchase", "view", "signup", "error"]
        ],
    }))
    rc = main([
        "run", "-c", str(cfg), "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=events",
        f"data.flags_out={flags_out}",
        "time.start=2024-01-01T00:00:00", "time.end=2024-01-03T00:00:00",
        "time.window=1440min",
    ])
    assert rc == 0
    assert "ran 2 window(s)" in capsys.readouterr().out

    from pyspark.sql import functions as F

    flags = spark.read.parquet(flags_out)
    assert flags.select("flag_date").distinct().count() == 2
    n_bad = flags.where(F.col("qc_flag") == 4).count()
    # oracle: events in the window with value outside (0, 400)
    import duckdb

    exp = duckdb.connect().execute(
        "SELECT count(*) FROM '/root/testdata/sf0.001/events.parquet' "
        "WHERE ts >= '2024-01-01' AND ts < '2024-01-03' "
        "AND NOT (value > 0.0 AND value < 400.0)"
    ).fetchone()[0]
    assert n_bad == exp and flags.count() > 0


def test_curate_command(spark, tmp_path, capsys):
    """Corpus-side CLI: curation rules via dotted overrides, decisions
    parquet + per-rule kill report on stdout."""
    out = str(tmp_path / "curated")
    rc = main([
        "curate", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out}",
        "min_quality=0.5", "dedup=exact",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    back = spark.read.parquet(out)
    n_docs = back.count()
    assert sum(int(v) for v in report.values()) == n_docs
    assert back.where("keep").count() == int(report.get("kept", 0))
    # an invalid rule override fails with a pointed message
    assert main([
        "curate", "--keep-session", "data.input=/x", "data.out=/y",
        "min_quality=not_a_number",
    ]) == 2


def test_export_command(spark, tmp_path, capsys):
    """aums_data_request parity: windowed export pivots to one row per
    rounded second with {stream}_result/{stream}_flag columns."""
    out = str(tmp_path / "export_csv")
    rc = main([
        "export", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=events",
        f"data.csv_out={out}", "data.single_file=true",
        "time.start=2024-01-01T00:00:00", "time.end=2024-01-08T00:00:00",
    ])
    assert rc == 0
    assert "exported 5 stream(s)" in capsys.readouterr().out
    back = spark.read.option("header", True).csv(out)
    cols = set(back.columns)
    assert "ts_round" in cols
    for t in ("click", "purchase", "view", "signup", "error"):
        assert {f"{t}_result", f"{t}_flag"} <= cols
    # one row per rounded second, all inside the window
    n = back.count()
    assert n == back.select("ts_round").distinct().count() > 0
    assert main(["export"]) == 2  # pointed error on missing settings


def test_dedup_command(spark, tmp_path, capsys):
    """Dedup CLI: exact and fingerprint methods over the documents
    table, knobs via dotted overrides."""
    out = str(tmp_path / "dd_exact")
    rc = main([
        "dedup", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out}", "method=exact",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(report["groups"]) > 0
    assert spark.read.parquet(out).count() == int(report["groups"])

    out2 = str(tmp_path / "dd_fp")
    rc = main([
        "dedup", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out2}", "method=fingerprint", "min_shared=3",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert spark.read.parquet(out2).count() == int(report["pairs"])

    # round-10: banded-Hamming simhash pairs through the same surface
    out3 = str(tmp_path / "dd_sh")
    rc = main([
        "dedup", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out3}", "method=simhash", "max_hamming=2",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    back = spark.read.parquet(out3)
    assert back.count() == int(report["pairs"]) > 0
    assert back.agg({"hamming": "max"}).collect()[0][0] <= 2

    # unknown method is a pointed config error
    assert main([
        "dedup", "--keep-session", "data.input=/x", "data.out=/y",
        "method=nope",
    ]) == 2


def test_pretrain_command(spark, tmp_path, capsys):
    """Capstone CLI: documents parquet → shards with report printed."""
    out = str(tmp_path / "corpus")
    rc = main([
        "pretrain", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out}",
        "chunk_tokens=64", "overlap_tokens=8", "pack_budget=256",
        "n_shards=2", "curation.max_word_rep_ratio=0.9",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(report["chunks"]) > 0
    assert int(report["shards"]) >= 1
    import glob
    import os
    assert glob.glob(os.path.join(out, "shards", "*.tar"))


def test_pretrain_command_jsonl_input(spark, tmp_path, capsys):
    """JSONL ingest path: quarantine count printed, corpus built from
    the clean rows."""
    import json

    land = tmp_path / "docs.jsonl"
    with open(land, "w") as f:
        for i in range(30):
            f.write(json.dumps({
                "doc_id": i,
                "text": f"document number {i} with several plain words "
                        f"and unique token tk{i}",
                "lang": "en", "source": "t", "n_chars": 40,
            }) + "\n")
        f.write("{ broken json line\n")
    out = str(tmp_path / "corpus")
    rc = main([
        "pretrain", "--keep-session",
        f"data.input={land}", "data.table=jsonl", f"data.out={out}",
        "chunk_tokens=8", "overlap_tokens=2", "pack_budget=32",
        "n_shards=2", "near_dedup=false",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert report["quarantined"] == "1"
    assert sum(
        int(v) for k, v in report.items()
        if k not in ("quarantined", "chunks", "shards", "shard_bytes")
    ) == 30
    assert int(report["chunks"]) > 30  # several chunks per doc at 8 tokens


def test_dedup_lines_method(spark, tmp_path, capsys):
    out = str(tmp_path / "dd_lines")
    rc = main([
        "dedup", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out}", "method=lines",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(report["docs"]) > 0
    assert "lines_removed" in report


def test_ann_command(spark, tmp_path, capsys):
    """ANN CLI: brute and ivfadc methods over the embeddings parquet,
    self-queries via query_stride."""
    src = "/root/testdata/sf0.001/embeddings.parquet"
    out = str(tmp_path / "ann_brute")
    rc = main([
        "ann", "--keep-session", f"data.input={src}", f"data.out={out}",
        "method=brute", "k=5", "query_stride=20",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    nq, nr = int(report["queries"]), int(report["results"])
    assert nq > 0 and nr == nq * 5

    for method in ("ivfadc", "ivf"):
        out2 = str(tmp_path / f"ann_{method}")
        rc = main([
            "ann", "--keep-session", f"data.input={src}",
            f"data.out={out2}", f"method={method}", "k=3",
            "query_stride=20", "n_lists=4",
        ])
        assert rc == 0
        report = dict(
            line.split(": ")
            for line in capsys.readouterr().out.strip().splitlines()
        )
        assert int(report["results"]) == int(report["queries"]) * 3
        res = spark.read.parquet(out2)
        # uniform contract: the query never returns itself
        assert res.where("neighbor_id = query_id").count() == 0

    assert main([
        "ann", "--keep-session", "data.input=/x", "data.out=/y",
        "method=nope",
    ]) == 2


def test_ann_index_persistence_round_trip(spark, tmp_path, capsys):
    """ivfadc index.out persists lists/+model.json; index.in serves
    from the persisted index (no refit) and returns EXACTLY the rows
    the build run returned."""
    src = "/root/testdata/sf0.001/embeddings.parquet"
    idx = str(tmp_path / "ann_index")
    out1 = str(tmp_path / "ann_build")
    rc = main([
        "ann", "--keep-session", f"data.input={src}",
        f"data.out={out1}", "method=ivfadc", "k=3",
        "query_stride=20", "n_lists=4", f"index.out={idx}",
    ])
    assert rc == 0
    capsys.readouterr()
    import os

    assert os.path.exists(os.path.join(idx, "model.json"))
    assert any(
        d.startswith("cluster_id=")
        for d in os.listdir(os.path.join(idx, "lists"))
    )

    out2 = str(tmp_path / "ann_serve")
    rc = main([
        "ann", "--keep-session", f"data.input={src}",
        f"data.out={out2}", "method=ivfadc", "k=3",
        "query_stride=20", f"index.in={idx}",
    ])
    assert rc == 0
    capsys.readouterr()
    key = lambda df: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"])
        for r in spark.read.parquet(df).collect()
    )
    assert key(out2) == key(out1)

    # prune_batches=true (the serving-at-scale switch) is value-exact:
    # identical rows from the same persisted index
    out_p = str(tmp_path / "ann_serve_pruned")
    rc = main([
        "ann", "--keep-session", f"data.input={src}",
        f"data.out={out_p}", "method=ivfadc", "k=3",
        "query_stride=20", f"index.in={idx}", "prune_batches=true",
    ])
    assert rc == 0
    capsys.readouterr()
    assert key(out_p) == key(out1)

    # daily-admission tick: append a delta under an id, retry the same
    # invocation — the slice overwrites, the layout view converges
    delta = str(tmp_path / "delta")
    emb = spark.read.parquet(src)
    from pyspark.sql import functions as F

    emb.where(F.col("vec_id") % 20 == 7).write.parquet(delta)
    out3 = str(tmp_path / "ann_admit")
    argv = [
        "ann", "--keep-session", f"data.input={delta}",
        f"data.out={out3}", "method=ivfadc", "k=3",
        "query_stride=1", f"index.in={idx}",
        "index.append_id=2026-08-15",
    ]
    assert main(argv) == 0
    capsys.readouterr()
    first = key(out3)
    assert main(argv) == 0  # the cron retry
    capsys.readouterr()
    assert key(out3) == first
    import glob

    assert len(glob.glob(
        os.path.join(idx, "lists_appends", "append=*")
    )) == 1
    # the appended vectors are now served: each delta query must find
    # ITSELF in the index (adc distance to its own code is minimal)
    served = {q for q, _ in first}
    assert served  # delta-derived queries exist
    # append_id without index.in is a pointed failure
    import pytest

    with pytest.raises(SystemExit, match="append_id"):
        main([
            "ann", "--keep-session", f"data.input={delta}",
            f"data.out={out3}", "method=ivfadc",
            "index.append_id=x",
        ])


def test_profile_command(spark, tmp_path, capsys):
    """Profile CLI: token heavy hitters and key-skew report."""
    out = str(tmp_path / "prof_tok")
    rc = main([
        "profile", "--keep-session",
        "data.input=/root/testdata/sf0.001", "data.table=documents",
        f"data.out={out}", "method=tokens", "min_fraction=0.01",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(report["rows"]) > 0
    cols = spark.read.parquet(out).columns
    assert sorted(cols) == ["n", "token"]

    out2 = str(tmp_path / "prof_skew")
    rc = main([
        "profile", "--keep-session",
        "data.input=/root/testdata/sf0.001/events.parquet",
        f"data.out={out2}", "method=skew", "key=user_id",
    ])
    assert rc == 0
    capsys.readouterr()
    assert spark.read.parquet(out2).count() == 1

    # missing key for skew is a pointed config error
    assert main([
        "profile", "--keep-session", "data.input=/x", "data.out=/y",
        "method=skew",
    ]) == 2


def test_ann_external_queries_keep_id_collisions(spark, tmp_path, capsys):
    """With queries.input set, pq returns raw top-k: a query id that
    coincidentally equals a corpus vec_id is NOT self-filtered
    (ADVICE r3), and every query still gets exactly k rows."""
    src = "/root/testdata/sf0.001/embeddings.parquet"
    emb = spark.read.parquet(src)
    # external queries reusing corpus vectors AND their ids — the
    # strongest-possible collision case
    qpath = str(tmp_path / "ext_queries")
    emb.where("vec_id % 50 = 0").select(
        emb.vec_id.alias("query_id"), "embedding"
    ).write.parquet(qpath)
    out = str(tmp_path / "ann_ext")
    rc = main([
        "ann", "--keep-session", f"data.input={src}", f"data.out={out}",
        "method=pq", "k=3", f"queries.input={qpath}", "m=4", "kcode=8",
    ])
    assert rc == 0
    capsys.readouterr()
    res = spark.read.parquet(out)
    nq = res.select("query_id").distinct().count()
    assert res.count() == nq * 3
    # the colliding id is a legitimate neighbor here — with identical
    # vectors the self row has ADC distance ~0 and must appear
    assert res.where("neighbor_id = query_id").count() > 0


def test_profile_cms_and_badwords(spark, tmp_path, capsys):
    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "cms")
    rc = main([
        "profile", "--keep-session", f"data.input={src}", f"data.out={out}",
        "data.table=documents", "method=cms", "width=64", "depth=3",
    ])
    assert rc == 0
    capsys.readouterr()
    cells = spark.read.parquet(out)
    assert 0 < cells.count() <= 64 * 3
    assert set(cells.columns) == {"row", "col", "n"}

    out2 = str(tmp_path / "bw")
    rc = main([
        "profile", "--keep-session", f"data.input={src}",
        f"data.out={out2}", "data.table=documents", "method=badwords",
        "patterns=[scan, fast]",
    ])
    assert rc == 0
    capsys.readouterr()
    res = spark.read.parquet(out2)
    assert res.where("n_matches > 0").count() > 0

    assert main([
        "profile", "--keep-session", f"data.input={src}", "data.out=/x",
        "method=badwords",
    ]) == 2


def test_refresh_command(spark, tmp_path, capsys):
    """Two incremental refreshes through the CLI: second snapshot only
    processes its delta; finalize writes shards of the current view."""
    snap1 = str(tmp_path / "s1")
    spark.createDataFrame(
        [(1, "plenty of clean readable prose words in this body one"),
         (2, "another perfectly clean document body with words two")],
        ["doc_id", "text"],
    ).write.parquet(snap1)
    state = str(tmp_path / "state")
    rc = main([
        "refresh", "--keep-session", f"data.input={snap1}",
        f"data.state={state}", "max_word_rep_ratio=0.5",
    ])
    assert rc == 0
    out1 = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert out1["added"] == "2" and out1["admitted"] == "2"

    snap2 = str(tmp_path / "s2")
    spark.createDataFrame(
        [(1, "plenty of clean readable prose words in this body one"),
         (2, "another perfectly clean document body with words two"),
         (3, "a fresh third document with plenty of readable words")],
        ["doc_id", "text"],
    ).write.parquet(snap2)
    fin = str(tmp_path / "final")
    rc = main([
        "refresh", "--keep-session", f"data.input={snap2}",
        f"data.state={state}", f"data.finalize_out={fin}",
        "max_word_rep_ratio=0.5", "pretrain.chunk_tokens=16",
        "pretrain.overlap_tokens=4", "pretrain.pack_budget=64",
        "pretrain.n_shards=2",
    ])
    assert rc == 0
    out2 = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert out2["unchanged"] == "2" and out2["processed"] == "1"
    assert int(out2["chunks"]) > 0
    import os
    assert os.path.isdir(os.path.join(fin, "shards"))


def test_profile_distinct_and_quantiles(spark, tmp_path, capsys):
    src = str(tmp_path / "rows")
    spark.range(3000).selectExpr(
        "cast(id % 3 as string) AS g",
        "concat('u', id % 500) AS k",
        "cast(1 + id % 100 as double) AS v",
    ).write.parquet(src)

    out = str(tmp_path / "hll")
    rc = main([
        "profile", "--keep-session", f"data.input={src}",
        f"data.out={out}", "method=distinct", "key=k", "group=g", "p=10",
    ])
    assert rc == 0
    capsys.readouterr()
    res = {r["g"]: r["est_distinct"] for r in
           spark.read.parquet(out).collect()}
    assert set(res) == {"0", "1", "2"}
    for est in res.values():  # ~500 distinct per group, p=10 -> ~3.3% sigma
        assert abs(est - 500) / 500 < 0.15

    out2 = str(tmp_path / "dd")
    rc = main([
        "profile", "--keep-session", f"data.input={src}",
        f"data.out={out2}", "method=quantiles", "value=v", "group=g",
        "alpha=0.01", "probs=[0.5]",
    ])
    assert rc == 0
    capsys.readouterr()
    med = {r["g"]: r["est"] for r in spark.read.parquet(out2).collect()}
    for v in med.values():
        assert abs(v - 50.0) / 50.0 < 0.05

    # missing knobs -> config error
    assert main([
        "profile", "--keep-session", f"data.input={src}", "data.out=/x",
        "method=distinct",
    ]) == 2
    assert main([
        "profile", "--keep-session", f"data.input={src}", "data.out=/x",
        "method=quantiles",
    ]) == 2


def test_template_calibrate(spark, tmp_path):
    """template --calibrate: QC ranges derived from DDSketch quantiles
    of the observed data, loadable by QCConfig, and the derived bounds
    flag only genuine tail values."""
    import yaml

    from qualityassurancetool_spark.config import QCConfig

    out = str(tmp_path / "qc.yaml")
    rc = main([
        "template", "--keep-session",
        "--input", "/root/testdata/sf0.001",
        "--out", out, "--calibrate", "--lo", "0.01", "--hi", "0.99",
        "--margin", "0.05",
    ])
    assert rc == 0
    doc = yaml.safe_load(open(out))
    ids = {e["id"] for e in doc["QC"]}
    assert {"click", "view"} <= ids
    for e in doc["QC"]:
        assert e["range"]["min"] < e["range"]["max"]
    QCConfig.from_dict(doc)  # loadable as a real config


def test_suggest_qc_ranges_semantics(spark):
    from pyspark.sql import functions as F

    from qualityassurancetool_spark.config import (
        ConfigError,
        suggest_qc_ranges,
    )

    obs = spark.range(1000).select(
        F.lit("s1").alias("observation_type"),
        (F.col("id") + 1.0).alias("result"),
    )
    doc = suggest_qc_ranges(obs, lo=0.1, hi=0.9, alpha=0.01)
    (entry,) = doc["QC"]
    assert entry["id"] == "s1"
    # ~10th/90th percentile of 1..1000 within sketch tolerance
    assert entry["range"]["min"] == pytest.approx(100, rel=0.05)
    assert entry["range"]["max"] == pytest.approx(900, rel=0.05)
    # margin widens away from the interval
    doc2 = suggest_qc_ranges(obs, lo=0.1, hi=0.9, margin=0.1)
    (e2,) = doc2["QC"]
    assert e2["range"]["min"] < entry["range"]["min"]
    assert e2["range"]["max"] > entry["range"]["max"]
    with pytest.raises(ConfigError):
        suggest_qc_ranges(obs, lo=0.9, hi=0.1)
    with pytest.raises(ConfigError):
        suggest_qc_ranges(obs, margin=-1)


def test_ann_index_in_equals_out_rejected(spark, tmp_path):
    """index.in == index.out would overwrite the layout the serve plan is
    lazily reading (Spark aborts mid-job) — rejected up front."""
    import pytest

    idx = str(tmp_path / "ann_idx_same")
    src = "/root/testdata/sf0.001/embeddings.parquet"
    rc = main([
        "ann", "--keep-session", f"data.input={src}",
        f"data.out={tmp_path / 'build'}", "method=ivfadc", "k=3",
        "query_stride=20", "n_lists=4", f"index.out={idx}",
    ])
    assert rc == 0
    with pytest.raises(SystemExit, match="index.in == index.out"):
        main([
            "ann", "--keep-session", f"data.input={src}",
            f"data.out={tmp_path / 'serve'}", "method=ivfadc", "k=3",
            "query_stride=20", f"index.in={idx}", f"index.out={idx}",
        ])


def test_dedup_minhash_cli(spark, tmp_path, capsys):
    """dedup method=minhash: monolithic and band-batched schedules emit
    the same verified pairs parquet."""
    src = "/root/testdata/sf0.001/documents.parquet"
    out1 = str(tmp_path / "mh_pairs")
    rc = main([
        "dedup", "--keep-session", f"data.input={src}",
        f"data.out={out1}", "method=minhash", "bands=8",
        "num_hashes=16", "threshold=0.5",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(report["pairs"]) > 0

    out2 = str(tmp_path / "mh_pairs_batched")
    rc = main([
        "dedup", "--keep-session", f"data.input={src}",
        f"data.out={out2}", "method=minhash", "bands=8",
        "num_hashes=16", "threshold=0.5", "band_batches=4",
        f"work_dir={tmp_path / 'mh_work'}",
    ])
    assert rc == 0
    capsys.readouterr()
    key = lambda p: sorted(  # noqa: E731
        (r["id_a"], r["id_b"]) for r in spark.read.parquet(p).collect()
    )
    assert key(out2) == key(out1)

    # work_dir= ALONE selects the batched schedule (one pass per band):
    # a user who configured scratch must not silently get the
    # monolithic plan that spills at the scale work_dir exists for
    # (review finding, round 8)
    out3 = str(tmp_path / "mh_pairs_workdir_only")
    work3 = tmp_path / "mh_work3"
    rc = main([
        "dedup", "--keep-session", f"data.input={src}",
        f"data.out={out3}", "method=minhash", "bands=8",
        "num_hashes=16", "threshold=0.5", f"work_dir={work3}",
    ])
    assert rc == 0
    capsys.readouterr()
    assert (work3 / "sig").exists()  # the scratch was actually used
    assert key(out3) == key(out1)


def test_ann_index_in_and_out_warns_relayout(spark, tmp_path, capsys):
    """index.in + a DIFFERENT index.out is the sanctioned re-layout path:
    it must warn (full rewrite) but complete, and the new layout must
    serve the same results."""
    src = "/root/testdata/sf0.001/embeddings.parquet"
    idx1 = str(tmp_path / "idx1")
    rc = main([
        "ann", "--keep-session", f"data.input={src}",
        f"data.out={tmp_path / 'build'}", "method=ivfadc", "k=3",
        "query_stride=20", "n_lists=4", f"index.out={idx1}",
    ])
    assert rc == 0
    capsys.readouterr()

    idx2 = str(tmp_path / "idx2")
    rc = main([
        "ann", "--keep-session", f"data.input={src}",
        f"data.out={tmp_path / 'serve'}", "method=ivfadc", "k=3",
        "query_stride=20", f"index.in={idx1}", f"index.out={idx2}",
        "index.files_per_list=2",
    ])
    assert rc == 0
    assert "re-layout" in capsys.readouterr().out
    import glob
    import os

    assert os.path.exists(os.path.join(idx2, "model.json"))
    # the salted re-layout actually applied: <= files_per_list parquet
    # part files inside every cluster_id directory
    list_dirs = glob.glob(os.path.join(idx2, "lists", "cluster_id=*"))
    assert list_dirs
    for d in list_dirs:
        parts = glob.glob(os.path.join(d, "*.parquet"))
        assert 1 <= len(parts) <= 2, d
    key = lambda p: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"])
        for r in spark.read.parquet(p).collect()
    )
    assert key(str(tmp_path / "serve")) == key(str(tmp_path / "build"))


def test_dedup_minhash_admit_cli(spark, tmp_path, capsys):
    """dedup method=minhash state=<dir>: admission of a delta against a
    bootstrapped state; update_state=false leaves the state frozen."""
    src = "/root/testdata/sf0.001/documents.parquet"
    state = str(tmp_path / "mh_state")
    # bootstrap: batched run over the non-delta corpus writes the state
    docs = spark.read.parquet(src)
    from qualityassurancetool_spark.operators.dedup import (
        minhash_dedup_batched,
    )
    from pyspark.sql import functions as F

    minhash_dedup_batched(
        docs.where(F.col("doc_id") % 7 != 0), state,
        num_hashes=16, bands=8, threshold=0.5,
    ).count()
    delta_path = str(tmp_path / "delta")
    docs.where(F.col("doc_id") % 7 == 0).write.parquet(delta_path)

    out = str(tmp_path / "admit_pairs")
    rc = main([
        "dedup", "--keep-session", f"data.input={delta_path}",
        f"data.out={out}", "method=minhash", f"state={state}",
        "bands=8", "num_hashes=16", "threshold=0.5",
        "update_state=false",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(report["pairs"]) > 0

    # admission_id= makes the scripted path retry-idempotent: the same
    # CLI invocation replayed converges (overwrite slices, no append)
    out2 = str(tmp_path / "admit_pairs_v2")
    argv = [
        "dedup", "--keep-session", f"data.input={delta_path}",
        f"data.out={out2}", "method=minhash", f"state={state}",
        "bands=8", "num_hashes=16", "threshold=0.5",
        "admission_id=2026-08-15",
    ]
    assert main(argv) == 0
    first = capsys.readouterr().out
    assert main(argv) == 0  # the cron retry
    assert capsys.readouterr().out == first
    import glob

    slices = [
        p
        for p in glob.glob(state + "/sig_admissions/admission=*")
        if not p.endswith("_cand")
    ]
    assert len(slices) == 1  # one slice, not two appends


def test_dedup_spans_cli(spark, tmp_path, capsys):
    """dedup method=spans: monolithic and hash-sliced schedules emit
    the same cleaned corpus; hash_batches=/work_dir= selects the
    bounded-state schedule (and actually uses the scratch)."""
    src = "/root/testdata/sf0.001/documents.parquet"
    out1 = str(tmp_path / "spans")
    rc = main([
        "dedup", "--keep-session", f"data.input={src}",
        f"data.out={out1}", "method=spans", "window_tokens=10",
    ])
    assert rc == 0
    report = dict(
        line.split(": ")
        for line in capsys.readouterr().out.strip().splitlines()
    )
    assert int(report["docs"]) > 0

    out2 = str(tmp_path / "spans_batched")
    work = tmp_path / "spans_work"
    rc = main([
        "dedup", "--keep-session", f"data.input={src}",
        f"data.out={out2}", "method=spans", "window_tokens=10",
        "hash_batches=3", f"work_dir={work}",
    ])
    assert rc == 0
    capsys.readouterr()
    assert (work / "wins").exists() and (work / "dups").exists()
    key = lambda p: sorted(  # noqa: E731
        (r["doc_id"], r["deduped"], r["n_tokens_removed"])
        for r in spark.read.parquet(p).collect()
    )
    assert key(out2) == key(out1)
