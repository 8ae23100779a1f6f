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


def delete_path(spark: SparkSession, path: str) -> None:
    """Recursive delete; no-op when the path does not exist (scratch
    cleanup — callers must never point this at state they still read)."""
    fs, p = _fs_and_path(spark, path)
    if fs.exists(p):
        fs.delete(p, True)


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Small driver-side text file (metadata markers), any scheme."""
    fs, p = _fs_and_path(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
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
