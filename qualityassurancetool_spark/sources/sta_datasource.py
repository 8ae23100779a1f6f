"""SensorThings custom DataSource (Python Data Source API, Spark 4).

The reference's bulk fetch (S1, ``get_all_data`` — reference
``src/main.py:349-364``) pulls one Thing's observations as *paginated*
OData responses (``$top/$skip`` / ``Observations@iot.nextLink``) and
flattens them into the long observations table.  This source maps that
contract onto Spark's scan architecture directly:

- **pagination ≡ partitioned reads**: every page is an ``InputPartition``;
  pages are fetched *in executors, in parallel*, not sequentially on a
  driver thread like the reference's two fetch threads;
- the nested ``Datastreams[] → Observations[]`` document is flattened to
  one row per observation inside the partition reader (same output shape
  as ``sources/sta_json.flatten_response``);
- the driver side only enumerates pages (the cheap ``$count``/``$skip``
  probe), never touches observation payloads.

This build enumerates page *files* (a landed crawl of the REST responses
— the hermetic form the tests drive).  A live deployment swaps
``_read_page``'s ``open()`` for an HTTP GET of the page URL; the
partition planning, flattening, and schema contract stay identical.

Usage::

    from qualityassurancetool_spark.sources.sta_datasource import (
        SensorThingsDataSource,
    )

    spark.dataSource.register(SensorThingsDataSource)
    df = (spark.read.format("sensorthings")
          .option("pages_per_partition", 1)
          .load("/path/to/page-files"))
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OBS_SCHEMA = StructType(
    [
        StructField("iot_id", LongType()),
        StructField("result", DoubleType()),
        StructField("phenomenon_time", TimestampType()),
        StructField("qc_flag", ByteType()),
        StructField("datastream_id", LongType()),
        StructField("lat", DoubleType()),
        StructField("long", DoubleType()),
        StructField("feature_id", LongType()),
        StructField("observation_type", StringType()),
        StructField("units", StringType()),
    ]
)


class _PagePartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


def _parse_ts(s):
    """ISO-8601 → naive-UTC datetime (Spark session TZ is UTC)."""
    if s is None:
        return None
    import datetime as dt

    t = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if t.tzinfo is not None:
        t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return t


def _flatten_page(doc: dict) -> Iterator[tuple]:
    for ds in doc.get("Datastreams") or []:
        ds_id = ds.get("@iot.id")
        ds_id = int(ds_id) if ds_id is not None else None
        units = (ds.get("unitOfMeasurement") or {}).get("name")
        obs_type = (ds.get("ObservedProperty") or {}).get("name")
        for o in ds.get("Observations") or []:
            foi = (o.get("FeatureOfInterest") or {})
            coords = ((foi.get("feature") or {}).get("coordinates")) or []
            qf = o.get("resultQuality")
            yield (
                o.get("@iot.id"),
                o.get("result"),
                _parse_ts(o.get("phenomenonTime")),
                int(qf) if qf is not None else None,
                ds_id,
                float(coords[1]) if len(coords) > 1 else None,
                float(coords[0]) if len(coords) > 0 else None,
                foi.get("@iot.id"),
                obs_type,
                units,
            )


def _read_page(path: str) -> dict:
    # live deployment: requests.get(page_url).json() — same contract
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


class SensorThingsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("sensorthings source requires a path")
        self.pages_per_partition = int(options.get("pages_per_partition", 1))

    def partitions(self) -> list[InputPartition]:
        if os.path.isdir(self.root):
            pages = sorted(
                os.path.join(self.root, f)
                for f in os.listdir(self.root)
                if f.endswith(".json")
            )
        else:
            pages = [self.root]
        k = max(self.pages_per_partition, 1)
        groups = [pages[i : i + k] for i in range(0, len(pages), k)]
        return [_PagePartition(g) for g in groups] or [_PagePartition([])]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        for path in partition.paths:
            yield from _flatten_page(_read_page(path))


class SensorThingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sensorthings"

    def schema(self) -> StructType:
        return OBS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SensorThingsReader(self.options)
