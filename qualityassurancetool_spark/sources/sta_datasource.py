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

Two page sources behind one contract:

- **file pages** (hermetic, the landed-crawl form): ``load(dir)`` of
  ``*.json`` response documents;
- **live HTTP** (``load("http://host/v1.1/Things(1)?$expand=...")``): the
  driver runs one cheap ``$top=0&$count=true`` probe to learn the total
  observation count (reference count probe: ``Settings.TOP(0)``,
  ``src/main.py:86``), derives ``ceil(count/page_size)`` page URLs with
  ``$top/$skip``, and each page URL becomes an input partition fetched
  *in executors, in parallel* with retry/backoff — the driver never
  touches observation payloads.

Usage::

    from qualityassurancetool_spark.sources.sta_datasource import (
        SensorThingsDataSource,
    )

    spark.dataSource.register(SensorThingsDataSource)
    df = (spark.read.format("sensorthings")
          .option("pages_per_partition", 1)
          .load("/path/to/page-files"))
    live = (spark.read.format("sensorthings")
            .option("page_size", 1000)
            .load("http://frost:8080/v1.1/Things(1)?$expand=Datastreams"))
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
    def __init__(self, paths: list[str], http_opts: dict | None = None):
        self.paths = paths
        self.http_opts = http_opts or {}


def _is_url(s: str) -> bool:
    return s.startswith("http://") or s.startswith("https://")


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


def _read_page(path: str, http_opts: dict | None = None) -> dict:
    if _is_url(path):
        from .http_client import request_json

        return request_json(path, **(http_opts or {})) or {}
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


class SensorThingsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("sensorthings source requires a path")
        self.pages_per_partition = int(options.get("pages_per_partition", 1))
        self.page_size = int(options.get("page_size", 1000))
        self.http_opts = {
            "timeout": float(options.get("timeout", 30.0)),
            "retries": int(options.get("retries", 4)),
            "backoff": float(options.get("backoff", 0.5)),
        }
        user = options.get("auth_user")
        if user is not None:
            self.http_opts["auth"] = (user, options.get("auth_pass", ""))

    def _http_pages(self) -> list[str]:
        """Driver-side page planning: one ``$top=0&$count=true`` probe →
        ``$top/$skip`` page URLs.  Only the count crosses the wire here;
        observation payloads are fetched executor-side."""
        from .http_client import request_json, with_query

        probe = request_json(
            with_query(self.root, "$top=0&$count=true"), **self.http_opts
        ) or {}
        count = int(probe.get("@iot.count", 0))
        return [
            with_query(self.root, f"$top={self.page_size}&$skip={skip}")
            for skip in range(0, count, self.page_size)
        ]

    def partitions(self) -> list[InputPartition]:
        if _is_url(self.root):
            pages = self._http_pages()
        elif os.path.isdir(self.root):
            pages = sorted(
                os.path.join(self.root, f)
                for f in os.listdir(self.root)
                if f.endswith(".json")
            )
        else:
            pages = [self.root]
        k = max(self.pages_per_partition, 1)
        groups = [pages[i : i + k] for i in range(0, len(pages), k)]
        return [_PagePartition(g, self.http_opts) for g in groups] or [
            _PagePartition([], self.http_opts)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        for path in partition.paths:
            yield from _flatten_page(_read_page(path, partition.http_opts))


class SensorThingsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sensorthings"

    def schema(self) -> StructType:
        return OBS_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SensorThingsReader(self.options)
