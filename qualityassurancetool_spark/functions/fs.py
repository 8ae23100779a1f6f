"""Scheme-agnostic filesystem helpers via the JVM Hadoop FileSystem.

Driver-local ``os.path`` calls silently misread remote URIs: on a
cluster, ``os.path.exists("hdfs://nn/state/sig")`` is False even when
the state exists, which turned a missing-state COLD START convention
into silent wrong answers (review finding, round 8).  Every state-dir
existence/listing check in the incremental/streaming operators goes
through these instead — they resolve the path's own filesystem
(file://, hdfs://, s3a://, ...) from the active Hadoop configuration.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_and_path(spark, path)
    return bool(fs.exists(p))


def list_subdirs(
    spark: SparkSession, path: str, prefix: str = ""
) -> list[str]:
    """Names (not full paths) of the immediate subdirectories, sorted;
    [] when ``path`` does not exist."""
    fs, p = _fs_and_path(spark, path)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = str(st.getPath().getName())
        if st.isDirectory() and name.startswith(prefix):
            out.append(name)
    return sorted(out)


def mkdirs(spark: SparkSession, path: str) -> None:
    fs, p = _fs_and_path(spark, path)
    fs.mkdirs(p)


def _is_local(path: str) -> bool:
    """Text-file helpers dispatch on scheme: local paths use plain
    Python I/O — Hadoop's checksummed LocalFileSystem writes ``.crc``
    side files that make a HAND-EDITED marker unreadable, and the
    operator rollback procedure (docs/OPERATIONS.md) is exactly a hand
    edit of ``LAST_COMMITTED``.  Remote schemes go through the JVM."""
    from urllib.parse import urlparse

    return urlparse(path).scheme in ("", "file")


def rename_overwrite(spark: SparkSession, src: str, dst: str) -> None:
    """Atomic overwrite-rename (the commit primitive: HDFS renames
    atomically via ``FileContext``; local paths use ``os.replace``).
    ``FileSystem.rename`` alone FAILS when dst exists, and a
    delete-then-rename leaves a no-marker crash window — FileContext's
    ``Options.Rename.OVERWRITE`` closes it."""
    if _is_local(src) and _is_local(dst):
        import os

        os.replace(
            src.removeprefix("file://"), dst.removeprefix("file://")
        )
        return
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jsrc = jvm.org.apache.hadoop.fs.Path(src)
    jdst = jvm.org.apache.hadoop.fs.Path(dst)
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        jsrc.toUri(), conf
    )
    rename_cls = getattr(jvm, "org.apache.hadoop.fs.Options$Rename")
    overwrite = rename_cls.valueOf("OVERWRITE")
    gateway = spark.sparkContext._gateway
    opts = gateway.new_array(rename_cls, 1)
    opts[0] = overwrite
    fc.rename(jsrc, jdst, opts)


def delete_path(spark: SparkSession, path: str) -> None:
    """Recursive delete; no-op when the path does not exist (scratch
    cleanup — callers must never point this at state they still read)."""
    fs, p = _fs_and_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Small driver-side text file (metadata markers), any scheme.
    Local paths write plainly (no ``.crc`` side files — see
    :func:`_is_local`)."""
    if _is_local(path):
        import os

        local = path.removeprefix("file://")
        os.makedirs(os.path.dirname(local) or ".", exist_ok=True)
        with open(local, "w", encoding="utf-8") as fh:
            fh.write(text)
        return
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    if _is_local(path):
        with open(path.removeprefix("file://"), encoding="utf-8") as fh:
            return fh.read()
    fs, p = _fs_and_path(spark, path)
    stream = fs.open(p)
    try:
        # IOUtils drains the JVM-side stream without a py4j byte loop
        jvm = spark._jvm
        return str(
            jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()
