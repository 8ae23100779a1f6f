"""A8 dict-merge flag history and S12 YAML template sink."""

from __future__ import annotations

import yaml

from qualityassurancetool_spark.config import QCConfig, write_qc_yaml_template
from qualityassurancetool_spark.flags import combine_counts, update_flag_history


def test_combine_counts_sums_and_concats():
    assert combine_counts({"a": 1, "b": 2}, {"b": 3, "c": 4}) == {
        "a": 1,
        "b": 5,
        "c": 4,
    }
    assert combine_counts({"x": [1]}, {"x": [2], "y": [3]}) == {
        "x": [1, 2],
        "y": [3],
    }


def test_update_flag_history_accumulates():
    h = update_flag_history({}, "range", {4: 10, 0: 90})
    h = update_flag_history(h, "range", {4: 5})
    h = update_flag_history(h, "region", {3: 7})
    assert h == {"range": {4: 15, 0: 90}, "region": {3: 7}}


def test_yaml_template_roundtrips_into_config(spark, tmp_path):
    dim = spark.createDataFrame(
        [("click", "Clicks"), ("error", "Errors")], "stream_id string, name string"
    )
    path = str(tmp_path / "template.yaml")
    write_qc_yaml_template(dim, path, name_col="name")
    with open(path) as f:
        doc = yaml.safe_load(f)
    assert [e["id"] for e in doc["QC"]] == ["click", "error"]
    assert doc["QC"][0]["range"] == {"min": None, "max": None}
    # the emitted skeleton must parse through the config layer
    cfg = QCConfig.from_yaml(path)
    assert {s.stream_id for s in cfg.streams} == {"click", "error"}
