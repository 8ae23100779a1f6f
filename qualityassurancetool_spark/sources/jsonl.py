"""JSON-Lines corpus source/sink — the interchange format of the
training-data world (one JSON object per line, gzip-friendly,
append-friendly, every tool reads it).

Spark-first: ``spark.read.json`` already handles JSONL (including
``.gz``/``.zst`` by codec) with parallel per-file splits for plain
text; this module adds the two things a 100 TB pipeline needs on top:

 - an ENFORCED schema (schema inference is a full extra pass over the
   data and silently unions drifting shapes; a corpus contract should
   fail loudly instead) with ``columnNameOfCorruptRecord`` capture so
   malformed lines are quarantined, not dropped;
 - a writer that keeps documents one-object-per-line (no multiline
   arrays), optionally gzip-compressed, partitioned the usual
   ``lang=…`` way via ``sources/layout`` conventions.

Reference parity: the reference has CSV in/out only
(``src/main.py`` CSV export); JSONL is a beyond-reference addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table contract (TESTDATA.md); corrupt lines land in _bad
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_bad", T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Schema-enforced JSONL read.  Lines that do not parse (or violate
    the schema) surface whole in the ``_bad`` column instead of
    disappearing — filter ``_bad IS NULL`` for the clean view, count
    the rest for the ingest report."""
    if "_bad" not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_bad", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
    )


def jsonl_ingest_report(df: DataFrame) -> tuple[DataFrame, int]:
    """(clean_rows, n_corrupt) from a :func:`read_jsonl` frame.

    Caches the frame first: Spark disallows queries over a raw JSON
    read that reference ONLY the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    documented workaround, and an ingest report is a batch-level
    materialization anyway."""
    df = df.cache()
    n_bad = df.filter(F.col("_bad").isNotNull()).count()
    return df.filter(F.col("_bad").isNull()).drop("_bad"), n_bad


def write_jsonl(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compress: bool = False,
) -> None:
    """One JSON object per line, deterministic column order (Spark's
    json writer emits fields in schema order).  ``compress`` gzips each
    part file — splittable-enough for corpora because parallelism comes
    from the many part files, not intra-file splits."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
