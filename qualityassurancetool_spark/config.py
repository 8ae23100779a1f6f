"""Config layer: YAML/dict → validated threshold & dependency tables.

The reference drives every check from YAML (``conf/config.yaml:185-516``,
Cerberus-validated per ``src/yaml_schema.py``): per-stream ``range`` /
``gradient`` / ``zscore`` min-max pairs with a ``QC_global`` fallback
(``src/main.py:506-509``), plus dependent-quantity entries
(independent, dependent, dt_tolerance, optional stabilization).

Spark mapping: the config becomes one small *thresholds dimension
DataFrame* (one row per stream, null where unconfigured, global fallback
applied at build time) that broadcast-joins onto the observations — the
engine never loops over streams.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qualityassurancetool_spark.functions.timeutils import parse_timedelta_seconds

QC_TYPES = ("range", "gradient", "zscore")


class ConfigError(ValueError):
    """Raised on invalid QC config (the Cerberus-validation analog —
    reference ``src/yaml_schema.py:45-224`` and the dedicated CI workflow
    that validates every YAML against it)."""


_TOP_LEVEL_KEYS = {
    "QC",
    "QC_dependent",
    "QC_global",
    "zscore_time_window",
    "zscore_strategy",
    "zscore_frame",
    "window_strategy",
    "parity",  # one-switch preset: "reference" flips all parity knobs
    "location",
    "region_polygons",
    "region_strategy",
    "region_mask_cell_deg",
    "asof_materialize",
    "feature_flags",
    "overwrite_feature_flags",
    "drift",  # control-chart family (ewma / cusum knobs)
    "time",  # run window (orchestration-level; tolerated, unused here)
}
_DRIFT_EWMA_KEYS = {"alpha", "window", "nsigma", "min_history"}
_DRIFT_CUSUM_KEYS = {"slack", "threshold", "target", "sigma"}
_DRIFT_SEASONAL_KEYS = {"period", "nsigma", "min_samples", "loo"}
# name/description are annotations (the engine's own YAML template and
# the reference's configs carry them); they are tolerated, not consumed
_STREAM_KEYS = {"id", "name", "description"} | set(QC_TYPES)
_DEP_KEYS = {
    "independent",
    "dependent",
    "dt_tolerance",
    "QC",
    "dt_stabilization",
    "max_allowed_downtime",
    "flag_when_missing",
}
_LOCATION_KEYS = {
    "max_velocity",
    "max_acceleration",
    "time_window",
    "max_dx_dt",
    "connection",  # reference carries DB credentials here; unused
    # reference-parity knobs (golden-replay semantics)
    "distance",       # haversine | lambert | exact
    "marking",        # pair | reference
    "threshold_mode",  # nominal | span
}


def _check_minmax(owner: str, name: str, rng) -> None:
    if isinstance(rng, dict):
        extra = set(rng) - {"min", "max"}
        if extra:
            raise ConfigError(f"{owner}.{name}: unknown keys {sorted(extra)}")
        lo, hi = rng.get("min"), rng.get("max")
    else:
        try:
            lo, hi = rng
        except (TypeError, ValueError):
            raise ConfigError(
                f"{owner}.{name}: expected {{min,max}} or a 2-item pair, "
                f"got {rng!r}"
            ) from None
    for v in (lo, hi):
        if v is not None and not isinstance(v, (int, float)):
            raise ConfigError(f"{owner}.{name}: non-numeric bound {v!r}")
    if lo is not None and hi is not None and lo > hi:
        raise ConfigError(f"{owner}.{name}: min {lo} > max {hi}")


def effective_zscore_frame(d: dict) -> str:
    """The parity-dependent zscore_frame default, derived ONCE: the
    validator and ``QCConfig.from_dict`` both call this, so the frame
    that gets validated is exactly the frame that gets constructed
    (review finding, round 8 — two independent derivations could drift
    if the preset mapping ever changes)."""
    return d.get(
        "zscore_frame",
        "reference" if d.get("parity") == "reference" else "trailing",
    )


def validate_config_dict(d: dict) -> None:
    """Schema-validate a QC config dict; raises :class:`ConfigError` with
    a pointed message on the first violation.  Covers the same classes of
    mistake the reference's Cerberus schema rejects: unknown keys, missing
    ids, malformed min/max pairs, inverted bounds, bad timedelta strings.
    """
    if not isinstance(d, dict):
        raise ConfigError(f"config must be a mapping, got {type(d).__name__}")
    extra = set(d) - _TOP_LEVEL_KEYS
    if extra:
        raise ConfigError(f"unknown top-level keys {sorted(extra)}")
    for i, entry in enumerate(d.get("QC") or []):
        owner = f"QC[{i}]"
        if not isinstance(entry, dict) or "id" not in entry:
            raise ConfigError(f"{owner}: each stream entry needs an 'id'")
        extra = set(entry) - _STREAM_KEYS
        if extra:
            raise ConfigError(f"{owner}: unknown keys {sorted(extra)}")
        for t in QC_TYPES:
            if entry.get(t) is not None:
                _check_minmax(owner, t, entry[t])
    for i, entry in enumerate(d.get("QC_dependent") or []):
        owner = f"QC_dependent[{i}]"
        if not isinstance(entry, dict):
            raise ConfigError(f"{owner}: expected a mapping")
        missing = {"independent", "dependent"} - set(entry)
        if missing:
            raise ConfigError(f"{owner}: missing {sorted(missing)}")
        extra = set(entry) - _DEP_KEYS
        if extra:
            raise ConfigError(f"{owner}: unknown keys {sorted(extra)}")
        for k in ("dt_tolerance", "dt_stabilization", "max_allowed_downtime"):
            if entry.get(k) is not None:
                try:
                    parse_timedelta_seconds(entry[k])
                except Exception:
                    raise ConfigError(
                        f"{owner}.{k}: bad timedelta {entry[k]!r}"
                    ) from None
        if entry.get("QC", {}).get("range") is not None:
            _check_minmax(owner, "QC.range", entry["QC"]["range"])
    for t, rng in (d.get("QC_global") or {}).items():
        if t not in QC_TYPES:
            raise ConfigError(f"QC_global: unknown check type {t!r}")
        if isinstance(rng, dict) and "range" in rng:
            rng = rng["range"]
        _check_minmax("QC_global", t, rng)
    loc = d.get("location") or {}
    extra = set(loc) - _LOCATION_KEYS
    if extra:
        raise ConfigError(f"location: unknown keys {sorted(extra)}")
    if loc.get("time_window") is not None:
        try:
            parse_timedelta_seconds(loc["time_window"])
        except Exception:
            raise ConfigError(
                f"location.time_window: bad timedelta {loc['time_window']!r}"
            ) from None
    for knob in ("zscore_strategy", "window_strategy"):
        zs = d.get(knob, "window")
        if zs not in ("window", "bucketed"):
            raise ConfigError(
                f"{knob} must be window|bucketed, got {zs!r}"
            )
    parity = d.get("parity")
    if parity not in (None, "reference"):
        raise ConfigError(
            f"parity must be 'reference' (or absent), got {parity!r}"
        )
    frame = effective_zscore_frame(d)
    if frame not in ("trailing", "reference"):
        raise ConfigError(
            f"zscore_frame must be trailing|reference, got {frame!r}"
        )
    # frame='reference' is supported by BOTH window strategies since
    # round 8 (the bucketed twin implements the strict-past lagged
    # convention via boundary halos — parity-tested row-for-row), so no
    # strategy restriction applies here.
    for knob, allowed in (
        # "auto" = geodesic_m's lambert-selecting default — accepted
        # there, so accepted here (validation must not be narrower
        # than the implementation it guards)
        ("distance", ("haversine", "lambert", "exact", "auto")),
        ("marking", ("pair", "reference")),
        ("threshold_mode", ("nominal", "span")),
    ):
        v = (d.get("location") or {}).get(knob)
        if v is not None and v not in allowed:
            raise ConfigError(
                f"location.{knob} must be one of {allowed}, got {v!r}"
            )
    drift = d.get("drift")
    if drift is not None:
        if not isinstance(drift, dict):
            raise ConfigError("drift: expected a mapping")
        extra = set(drift) - {"ewma", "cusum", "seasonal"}
        if extra:
            raise ConfigError(f"drift: unknown keys {sorted(extra)}")
        for chart, keys in (
            ("ewma", _DRIFT_EWMA_KEYS),
            ("cusum", _DRIFT_CUSUM_KEYS),
            ("seasonal", _DRIFT_SEASONAL_KEYS),
        ):
            c = drift.get(chart)
            if c is None or c is True:
                continue
            if not isinstance(c, dict):
                raise ConfigError(
                    f"drift.{chart}: expected a mapping or true"
                )
            extra = set(c) - keys
            if extra:
                raise ConfigError(
                    f"drift.{chart}: unknown keys {sorted(extra)}"
                )
    rp = d.get("region_polygons")
    if isinstance(rp, str):
        pass  # a file path or URL; format checked at load time
    elif isinstance(rp, dict):
        # live database source: {jdbc: {url, table|query, ...}} —
        # the reference's PostGIS SeaVox shape (src/main.py:528-533)
        spec = rp.get("jdbc")
        if not isinstance(spec, dict) or not spec.get("url"):
            raise ConfigError(
                "region_polygons: mapping form needs jdbc.url"
            )
        if bool(spec.get("table")) == bool(spec.get("query")):
            raise ConfigError(
                "region_polygons.jdbc: exactly one of table/query"
            )
    else:
        for i, poly in enumerate(rp or []):
            owner = f"region_polygons[{i}]"
            if (
                not isinstance(poly, dict)
                or "name" not in poly
                or "coords" not in poly
            ):
                raise ConfigError(f"{owner}: needs 'name' and 'coords'")
            coords = poly["coords"]
            if not isinstance(coords, (list, tuple)) or len(coords) < 3:
                raise ConfigError(f"{owner}: a polygon needs >= 3 coordinates")


@dataclass
class StreamQC:
    stream_id: object  # int or str key
    range: tuple[float | None, float | None] | None = None
    gradient: tuple[float | None, float | None] | None = None
    zscore: tuple[float | None, float | None] | None = None


@dataclass
class DependentQC:
    independent: object
    dependent: object
    dt_tolerance: str | float = "0.5s"
    qc_range: tuple[float, float] | None = None  # secondary value check
    dt_stabilization: str | float | None = None
    max_allowed_downtime: str | float | None = None
    flag_when_missing: int | None = None


@dataclass
class QCConfig:
    streams: list[StreamQC] = field(default_factory=list)
    dependents: list[DependentQC] = field(default_factory=list)
    global_qc: dict[str, tuple[float | None, float | None]] = field(
        default_factory=dict
    )
    zscore_time_window: str | float = "60min"
    # "window" (plain per-stream RANGE frame) | "bucketed" (streams x
    # time-buckets twin — the low-stream-cardinality scale path).
    # window_strategy routes EVERY window stage of the QC chain
    # (gradient, z-score, stabilization, spatial-outlier median);
    # zscore_strategy is the narrower round-4 knob kept for
    # back-compat — bucketed on either routes the z-score.
    zscore_strategy: str = "window"
    window_strategy: str = "window"
    # z-score window convention (operators/zscore.calc_zscore): "trailing"
    # (pandas rolling, the SQL-oracle semantics) | "reference" (the
    # strict-past lagged population-σ convention the reference's shipped
    # golden count pins — tests/test_reference_goldens.py)
    zscore_frame: str = "trailing"
    # geo-track / spatial checks (reference conf/config.yaml:84-104)
    velocity_max: float | None = None
    acceleration_max: float | None = None
    outlier_time_window: str | float = "10min"
    outlier_max_dx_dt: float | None = None
    # reference-parity knobs (golden-fixture replay semantics,
    # tests/test_reference_goldens.py): distance kernel for the
    # velocity track (haversine|lambert|exact), marking convention
    # (pair|reference), outlier threshold mode (nominal|span)
    geo_distance: str = "haversine"
    geo_marking: str = "pair"
    outlier_threshold_mode: str = "nominal"
    # region polygons: [(name, [(lon, lat), ...]), ...]
    region_polygons: list | None = None
    # deferred live-DB polygon source ({url, table|query, ...}) — needs
    # a SparkSession, so it resolves lazily in the registry region
    # check via sources.polygon_files.load_polygons_jdbc (strict S5)
    region_polygons_jdbc: dict | None = None
    # physical strategy for the polygon lookup: auto (vertex-count
    # dispatch) | column | kernel | mask (rasterized land mask —
    # conclusive-cell lookup + exact boundary fallback, the 100 TB
    # accelerator; cell size in degrees below)
    region_strategy: str = "auto"
    region_mask_cell_deg: float = 0.25
    # materialize the plan once before the dependent as-of branches
    # (operators/asof._materialize_once: ON for 100 TB inputs, OFF at
    # small scale where codegen cost dominates re-execution)
    asof_materialize: bool = False
    # feature-level flag path (reference Df.FEATURE_QC_FLAG + reset.
    # overwrite_feature_flags): region check also writes feature_qc_flag
    feature_flags: bool = False
    overwrite_feature_flags: bool = True
    # control-chart family (`drift:` — ewma / cusum / seasonal knob
    # dicts; True selects the chart's defaults): persistent-shift and
    # learned-baseline companions to the per-point checks, run per
    # stream by the registry
    drift: dict | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "QCConfig":
        """``parity: reference`` is the one-switch golden-replay preset:
        it flips the DEFAULT of every reference-parity knob at once —
        ``zscore_frame="reference"``, ``location.distance="exact"``,
        ``location.marking="reference"``,
        ``location.threshold_mode="span"`` — so a reference migrant gets
        golden behavior from one line instead of four.  Explicitly set
        knobs still win over the preset.  (Export-side ``half_even``
        rounding, the fifth parity behavior, is already the default of
        ``operators/pivot_export.pivot_wide_export``.)  End-to-end golden
        replay through this preset: ``tests/test_parity_preset.py``."""
        validate_config_dict(d)
        p_ref = d.get("parity") == "reference"
        streams = []
        for entry in d.get("QC", []):
            kw = {"stream_id": entry["id"]}
            for t in QC_TYPES:
                rng = entry.get(t)
                if rng is not None:
                    kw[t] = (rng.get("min"), rng.get("max")) if isinstance(
                        rng, dict
                    ) else tuple(rng)
            streams.append(StreamQC(**kw))
        deps = []
        for entry in d.get("QC_dependent", []):
            dep_field = entry.get("dependent")
            dep_list = (
                dep_field if isinstance(dep_field, (list, tuple)) else [dep_field]
            )
            for dep in dep_list:
                deps.append(
                    DependentQC(
                        independent=entry["independent"],
                        dependent=dep,
                        dt_tolerance=entry.get("dt_tolerance", "0.5s"),
                        qc_range=(
                            tuple(entry["QC"]["range"])
                            if entry.get("QC", {}).get("range")
                            else None
                        ),
                        dt_stabilization=entry.get("dt_stabilization"),
                        max_allowed_downtime=entry.get("max_allowed_downtime"),
                        flag_when_missing=entry.get("flag_when_missing"),
                    )
                )
        glob = {}
        for t, rng in d.get("QC_global", {}).items():
            if isinstance(rng, dict) and "range" in rng:
                rng = rng["range"]
            if isinstance(rng, dict):
                glob[t] = (rng.get("min"), rng.get("max"))
            else:
                glob[t] = tuple(rng)
        geo = d.get("location", {})
        polys = None
        polys_jdbc = None
        rp = d.get("region_polygons")
        if isinstance(rp, str) and rp.startswith(("http://", "https://")):
            # remote asset (Natural Earth-style zip, or a bare polygon
            # file): download-once-then-cache via sources.assets — the
            # reference's get_ne_10m_shp behavior (src/main.py:577)
            import os as _os
            import tempfile as _tempfile

            from qualityassurancetool_spark.sources.assets import (
                fetch_cached,
                get_natural_earth_land,
            )
            from qualityassurancetool_spark.sources.polygon_files import (
                load_polygons,
            )

            cache = _os.environ.get(
                "QAT_ASSET_CACHE",
                _os.path.join(_tempfile.gettempdir(), "qat_assets"),
            )
            path = (
                get_natural_earth_land(cache, rp)
                if rp.endswith(".zip")
                else fetch_cached(rp, cache)
            )
            polys = load_polygons(path)
        elif isinstance(rp, str):
            # a polygon file (GeoJSON / WKT / WKB / shapefile) — reference
            # loads real land polygons from file (src/main.py:577)
            from qualityassurancetool_spark.sources.polygon_files import (
                load_polygons,
            )

            polys = load_polygons(rp)
        elif isinstance(rp, dict):
            polys_jdbc = dict(rp["jdbc"])  # validated above
        elif rp:
            polys = [
                (p["name"], [tuple(pt) for pt in p["coords"]]) for p in rp
            ]
        rs = str(d.get("region_strategy", "auto"))
        if rs not in ("auto", "column", "kernel", "mask"):
            raise ConfigError(
                f"region_strategy: {rs!r} not in auto|column|kernel|mask"
            )
        rcell = float(d.get("region_mask_cell_deg", 0.25))
        if rcell <= 0:
            raise ConfigError(
                f"region_mask_cell_deg must be > 0, got {rcell}"
            )
        return cls(
            streams=streams,
            dependents=deps,
            global_qc=glob,
            zscore_time_window=d.get("zscore_time_window", "60min"),
            zscore_strategy=d.get("zscore_strategy", "window"),
            window_strategy=d.get("window_strategy", "window"),
            zscore_frame=effective_zscore_frame(d),
            velocity_max=geo.get("max_velocity"),
            acceleration_max=geo.get("max_acceleration"),
            outlier_time_window=geo.get("time_window", "10min"),
            outlier_max_dx_dt=geo.get("max_dx_dt"),
            geo_distance=geo.get(
                "distance", "exact" if p_ref else "haversine"
            ),
            geo_marking=geo.get(
                "marking", "reference" if p_ref else "pair"
            ),
            outlier_threshold_mode=geo.get(
                "threshold_mode", "span" if p_ref else "nominal"
            ),
            asof_materialize=bool(d.get("asof_materialize", False)),
            feature_flags=bool(d.get("feature_flags", False)),
            overwrite_feature_flags=bool(
                d.get("overwrite_feature_flags", True)
            ),
            region_polygons=polys,
            region_polygons_jdbc=polys_jdbc,
            region_strategy=rs,
            region_mask_cell_deg=rcell,
            drift=d.get("drift"),
        )

    @classmethod
    def from_yaml(cls, path: str) -> "QCConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))

    def thresholds_df(self, spark: SparkSession) -> DataFrame:
        """The broadcastable thresholds dimension: one row per stream with
        qc_{type}_{min,max} columns; global fallback filled in."""
        rows = []
        for s in self.streams:
            row = {"stream_id": s.stream_id}
            for t in QC_TYPES:
                rng = getattr(s, t) or self.global_qc.get(t) or (None, None)
                row[f"qc_{t}_min"] = (
                    float(rng[0]) if rng[0] is not None else None
                )
                row[f"qc_{t}_max"] = (
                    float(rng[1]) if rng[1] is not None else None
                )
            rows.append(row)
        # VALUES literal relation (LocalRelation in the plan), NOT
        # createDataFrame: no Python->JVM RDD round-trip per call and the
        # optimizer can constant-fold/broadcast it directly
        cols = ["stream_id"] + [
            f"qc_{t}_{mm}" for t in QC_TYPES for mm in ("min", "max")
        ]

        def lit(v) -> str:
            if v is None:
                return "CAST(NULL AS DOUBLE)"
            return repr(float(v))

        def row_sql(r: dict) -> str:
            sid = str(r["stream_id"]).replace("'", "''")
            vals = ", ".join(
                lit(r[f"qc_{t}_{mm}"]) for t in QC_TYPES for mm in ("min", "max")
            )
            return f"('{sid}', {vals})"

        if not rows:
            # no per-stream rules (e.g. a config carrying only global /
            # geo checks): an empty VALUES list is invalid SQL, so emit
            # an empty relation with the same schema
            schema = "stream_id STRING, " + ", ".join(
                f"qc_{t}_{mm} DOUBLE" for t in QC_TYPES for mm in ("min", "max")
            )
            return spark.createDataFrame([], schema)
        values = ", ".join(row_sql(r) for r in rows)
        return spark.sql(
            f"SELECT * FROM (VALUES {values}) AS t({', '.join(cols)})"
        )

    def dependency_tolerance_seconds(self, dep: DependentQC) -> float:
        return parse_timedelta_seconds(dep.dt_tolerance)


def write_qc_yaml_template(
    stream_summary: DataFrame,
    path: str,
    id_col: str = "stream_id",
    name_col: str | None = None,
) -> None:
    """S12: emit a per-datastream QC-config skeleton from a (small)
    stream-dimension DataFrame (reference
    ``write_datastreamid_yaml_template``, ``src/main.py:118-143``).
    Metadata-scale -> driver-side ``collect`` by design."""
    import yaml

    rows = stream_summary.select(
        *( [id_col] + ([name_col] if name_col else []) )
    ).distinct().collect()
    doc = {
        "QC": [
            {
                "id": r[id_col],
                **({"name": r[name_col]} if name_col else {}),
                "range": {"min": None, "max": None},
                "gradient": {"min": None, "max": None},
                "zscore": {"min": None, "max": None},
            }
            for r in sorted(rows, key=lambda r: str(r[id_col]))
        ]
    }
    with open(path, "w") as f:
        yaml.safe_dump(doc, f, sort_keys=False)


def suggest_qc_ranges(
    obs: DataFrame,
    lo: float = 0.001,
    hi: float = 0.999,
    alpha: float = 0.02,
    margin: float = 0.0,
    id_col: str = "observation_type",
    value_col: str = "result",
) -> dict:
    """Auto-calibrated per-stream range thresholds from observed data:
    a QCConfig-ready ``{"QC": [{"id": ..., "range": {...}}]}`` dict
    whose min/max are the [lo, hi] DDSketch quantiles of each
    stream's values, widened by ``margin`` (relative).

    The reference leaves range bounds to hand-maintained YAML
    (``conf/config.yaml``); this derives the starting point from the
    data itself.  DDSketch (±alpha relative-error guarantee, bounded
    cell-table shuffle — see ``operators/ddsketch``) makes this a
    single cells-only pass even when one stream has billions of rows,
    where an exact per-group percentile would shuffle every value.
    Streams are metadata-cardinality, so the final collect is tiny."""
    from qualityassurancetool_spark.operators.ddsketch import (
        ddsketch_build,
        ddsketch_quantiles,
    )

    if not 0 <= lo < hi <= 1:
        raise ConfigError(f"need 0 <= lo < hi <= 1, got {lo}, {hi}")
    if margin < 0:
        raise ConfigError(f"margin must be >= 0, got {margin}")
    sk = ddsketch_build(obs, value_col, [id_col], alpha=alpha)
    rows = ddsketch_quantiles(
        sk, [lo, hi], [id_col], alpha=alpha
    ).collect()
    bounds: dict = {}
    for r in rows:
        b = bounds.setdefault(r[id_col], {})
        b["min" if r["prob"] == lo else "max"] = float(r["est"])

    def widen(v: float, up: bool) -> float:
        # widen AWAY from the interval regardless of sign
        d = abs(v) * margin
        return v + d if up else v - d

    return {
        "QC": [
            {
                "id": sid,
                "range": {
                    "min": widen(b["min"], up=False),
                    "max": widen(b["max"], up=True),
                },
            }
            for sid, b in sorted(bounds.items(), key=lambda kv: str(kv[0]))
        ]
    }
