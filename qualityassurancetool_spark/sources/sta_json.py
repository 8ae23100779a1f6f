"""SensorThings nested-response flatten (reference S2:
``response_datastreams_to_df`` — call/tests ``tests/test_other.py:9,33-34``;
document shape per /root/repo/FIXTURES.md F4).

``Datastreams[] → Observations[]`` nested JSON becomes the long observations
table: two ``explode``s + struct field access, all Catalyst-native (the JSON
scan prunes unreferenced fields).  Pagination markers
(``Observations@iot.nextLink``) surface as a column so an ingest driver can
schedule follow-up page fetches as additional partitioned reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qualityassurancetool_spark.schema import Obs

STA_RESPONSE_SCHEMA = """
    Datastreams ARRAY<STRUCT<
        `@iot.id`: STRING,
        name: STRING,
        description: STRING,
        unitOfMeasurement: STRUCT<name: STRING>,
        ObservedProperty: STRUCT<`@iot.id`: BIGINT, name: STRING>,
        Sensor: STRUCT<name: STRING, `@iot.id`: BIGINT, description: STRING>,
        Observations: ARRAY<STRUCT<
            `@iot.id`: BIGINT,
            result: DOUBLE,
            phenomenonTime: STRING,
            resultQuality: TINYINT,
            FeatureOfInterest: STRUCT<
                feature: STRUCT<coordinates: ARRAY<DOUBLE>>,
                `@iot.id`: BIGINT>>>,
        `Observations@iot.nextLink`: STRING>>
"""


def read_sta_response(spark, path: str) -> DataFrame:
    """Read raw SensorThings JSON response documents with explicit schema
    (never infer at scale — schema inference is a full extra pass)."""
    return spark.read.schema(STA_RESPONSE_SCHEMA).json(path)


def flatten_response(df: DataFrame) -> DataFrame:
    """Nested response → long observations table, one row per observation,
    FeatureOfInterest coordinates lifted to lat/long ([lon, lat] order)."""
    ds = df.select(F.explode("Datastreams").alias("ds"))
    obs = ds.select(
        F.col("ds.`@iot.id`").cast("long").alias(Obs.DATASTREAM_ID),
        F.col("ds.name").alias("datastream_name"),
        F.col("ds.unitOfMeasurement.name").alias(Obs.UNITS),
        F.col("ds.ObservedProperty.`@iot.id`").alias("observed_property_id"),
        F.col("ds.ObservedProperty.name").alias(Obs.OBSERVATION_TYPE),
        F.col("ds.Sensor.name").alias("sensor"),
        F.col("ds.`Observations@iot.nextLink`").alias("next_link"),
        F.explode("ds.Observations").alias("o"),
    )
    return obs.select(
        F.col("o.`@iot.id`").alias(Obs.IOT_ID),
        F.col("o.result").alias(Obs.RESULT),
        F.to_timestamp(F.col("o.phenomenonTime")).alias(Obs.TIME),
        F.col("o.resultQuality").alias(Obs.QC_FLAG),
        Obs.DATASTREAM_ID,
        F.col("o.FeatureOfInterest.feature.coordinates")[1].alias(Obs.LAT),
        F.col("o.FeatureOfInterest.feature.coordinates")[0].alias(Obs.LONG),
        F.col("o.FeatureOfInterest.`@iot.id`").alias(Obs.FEATURE_ID),
        Obs.OBSERVATION_TYPE,
        Obs.UNITS,
        "datastream_name",
        "sensor",
        "observed_property_id",
        "next_link",
    )
