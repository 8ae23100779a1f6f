"""qualityassurancetool_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``naturalsciences/qualityAssuranceTool`` (reference, read-only at
/root/reference): configurable quality-control checks over long/narrow
observation time-series (strict range, non-uniform time gradient, rolling
z-score, geodesic velocity/acceleration, rolling-median spatial outlier,
region checks, dependent-quantity as-of propagation, stabilization/downtime),
an ordered-severity flag algebra, reshaping/export, plus large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing).

Design: everything is a lazy Spark Column/DataFrame expression so one
Catalyst plan covers a whole pipeline; UDFs only where built-ins genuinely
cannot express the semantics (geodesic math stays in Column expressions;
pandas UDFs are reserved for raster/polygon lookups).
"""

from qualityassurancetool_spark.flags import QualityFlags, flag_merge, flag_rank
from qualityassurancetool_spark.session import get_spark

__all__ = ["QualityFlags", "flag_merge", "flag_rank", "get_spark"]

__version__ = "0.1.0"
