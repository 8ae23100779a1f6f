"""functions/fs — Hadoop-FS path helpers (scheme-agnostic existence /
listing used by the incremental & streaming dedup state dirs)."""

import os

from qualityassurancetool_spark.functions.fs import (
    list_subdirs,
    mkdirs,
    path_exists,
)


def test_local_roundtrip(spark, tmp_path):
    root = str(tmp_path / "state")
    assert not path_exists(spark, root)
    assert list_subdirs(spark, root) == []
    mkdirs(spark, os.path.join(root, "batch=2"))
    mkdirs(spark, os.path.join(root, "batch=10"))
    mkdirs(spark, os.path.join(root, "other"))
    open(os.path.join(root, "afile"), "w").write("x")
    assert path_exists(spark, root)
    assert list_subdirs(spark, root, prefix="batch=") == [
        "batch=10", "batch=2",
    ]  # lexicographic; callers sort numerically themselves
    assert "other" in list_subdirs(spark, root)
    assert "afile" not in list_subdirs(spark, root)  # dirs only
