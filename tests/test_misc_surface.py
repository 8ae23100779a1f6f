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


def test_config_validation_rejects_bad_configs():
    import pytest

    from qualityassurancetool_spark.config import (
        ConfigError,
        QCConfig,
        validate_config_dict,
    )

    good = {
        "QC": [{"id": "click", "range": {"min": 1.0, "max": 2.0}}],
        "QC_dependent": [
            {"independent": "a", "dependent": "b", "dt_tolerance": "0.5s"}
        ],
        "QC_global": {"zscore": {"min": -3, "max": 3}},
        "location": {"max_velocity": 10.0, "time_window": "10min"},
    }
    validate_config_dict(good)          # no raise
    QCConfig.from_dict(good)            # end-to-end still builds

    cases = [
        ({"QQ": []}, "unknown top-level"),
        ({"QC": [{"range": {"min": 0, "max": 1}}]}, "needs an 'id'"),
        ({"QC": [{"id": "x", "rangee": {}}]}, "unknown keys"),
        ({"QC": [{"id": "x", "range": {"min": 5, "max": 1}}]}, "min 5 > max 1"),
        ({"QC": [{"id": "x", "range": {"min": "lo", "max": 1}}]}, "non-numeric"),
        ({"QC": [{"id": "x", "range": {"minimum": 0}}]}, "unknown keys"),
        ({"QC_dependent": [{"independent": "a"}]}, "missing"),
        (
            {"QC_dependent": [{"independent": "a", "dependent": "b",
                               "dt_tolerance": "half a second"}]},
            "bad timedelta",
        ),
        ({"QC_global": {"median": [0, 1]}}, "unknown check type"),
        ({"location": {"velocity_max": 1.0}}, "unknown keys"),
        ({"region_polygons": [{"name": "x", "coords": [(0, 0)]}]}, ">= 3"),
    ]
    for bad, frag in cases:
        with pytest.raises(ConfigError, match="") as exc:
            validate_config_dict(bad)
        assert frag.lower().split()[0] in str(exc.value).lower(), (bad, exc.value)


def test_script_profile(spark):
    """Codepoint-block script detection: dominant script per doc,
    mixed-script counts, empty doc → 'none'."""
    from qualityassurancetool_spark.operators.text import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello plain english words"),
            (2, "这是一段中文文本内容"),
            (3, "Это русский текст"),
            (4, "mixed 中文 and english text here"),
            (5, "12345 !!! ??? ..."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in script_profile(df).collect()}
    assert out[1]["dominant_script"] == "latin"
    assert out[2]["dominant_script"] == "cjk"
    assert out[2]["cjk"] == 10
    assert out[3]["dominant_script"] == "cyrillic"
    assert out[4]["cjk"] == 2 and out[4]["latin"] > 2
    assert out[4]["dominant_script"] == "latin"
    assert out[5]["dominant_script"] == "none"
