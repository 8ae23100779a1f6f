from qualityassurancetool_spark.functions.geo import haversine_m
from qualityassurancetool_spark.functions.timeutils import (
    epoch_seconds,
    epoch_micros,
    round_to_seconds,
)
from qualityassurancetool_spark.functions.hashing import md5_long, shingles

__all__ = [
    "haversine_m",
    "epoch_seconds",
    "epoch_micros",
    "round_to_seconds",
    "md5_long",
    "shingles",
]
