"""Live-JDBC polygon source (S5 strict): load_polygons_jdbc over a real
embedded Derby database through spark.read.jdbc — an in-process stand-in
for the reference's live PostGIS SeaVox source
(/root/reference/src/main.py:528-533).  The geometry travels as
EWKB/WKB blobs (the ST_AsBinary export shape) and must decode to the
identical Polygons structure file ingestion produces."""

import struct

import pytest
from pyspark.sql import functions as F

from qualityassurancetool_spark.sources.polygon_files import (
    load_polygons_jdbc,
    polygons_from_wkb,
)
from qualityassurancetool_spark.sources.spatial import assign_region

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _wkb_polygon(ring, endian="<", srid=None):
    code = 1 if endian == "<" else 0
    gtype = 3 | (0x20000000 if srid is not None else 0)
    buf = struct.pack("B", code) + struct.pack(f"{endian}I", gtype)
    if srid is not None:
        buf += struct.pack(f"{endian}I", srid)
    buf += struct.pack(f"{endian}I", 1)  # one ring
    buf += struct.pack(f"{endian}I", len(ring))
    for x, y in ring:
        buf += struct.pack(f"{endian}2d", x, y)
    return buf


TRI = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (0.0, 0.0)]
SQ = [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0), (20.0, 20.0)]


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    """An embedded Derby database holding (name, geom_wkb BLOB) region
    rows — created through the Spark JVM so the SAME JVM later serves
    spark.read.jdbc."""
    db_dir = tmp_path_factory.mktemp("derby") / "regions_db"
    jvm = spark._jvm
    jvm.java.lang.System.setProperty(
        "derby.stream.error.file", str(db_dir) + ".log"
    )
    url = f"jdbc:derby:{db_dir}"
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.execute("CREATE TABLE regions (name VARCHAR(64), geom_wkb BLOB)")
    ps = conn.prepareStatement("INSERT INTO regions VALUES (?, ?)")
    rows = [
        ("MAINLAND", _wkb_polygon(TRI, srid=4326)),  # EWKB little-endian
        ("ISLAND", _wkb_polygon(SQ, endian=">")),    # plain WKB big-endian
    ]
    for name, blob in rows:
        ps.setString(1, name)
        ps.setBytes(2, blob)
        ps.executeUpdate()
    # a NULL-geometry row: must be skipped, not crash the decoder
    ps.setString(1, "NOWHERE")
    ps.setNull(2, jvm.java.sql.Types.BLOB)
    ps.executeUpdate()
    ps.close()
    st.close()
    conn.close()
    return url, rows


def test_jdbc_polygons_match_file_ingestion(spark, derby_db):
    url, rows = derby_db
    got = load_polygons_jdbc(
        spark, url, table="regions", name_col="name", driver=DRIVER
    )
    want = polygons_from_wkb([(n, b) for n, b in rows])
    assert sorted(got) == sorted(want)


def test_jdbc_query_pushdown_shape(spark, derby_db):
    """query= is the ST_AsBinary-export shape: the SELECT runs inside
    the database (Spark wraps it as a derived table), so server-side
    geometry serialization and row filtering both push down."""
    url, rows = derby_db
    got = load_polygons_jdbc(
        spark,
        url,
        query="SELECT name, geom_wkb FROM regions WHERE name = 'MAINLAND'",
        driver=DRIVER,
    )
    assert [n for n, _ in got] == ["MAINLAND"]


def test_jdbc_regions_equal_file_regions_downstream(spark, derby_db):
    """assign_region over JDBC-loaded polygons ≡ over the same polygons
    ingested as WKB items — the full S5 round trip."""
    url, rows = derby_db
    pts = spark.createDataFrame(
        [(0, 2.0, 2.0), (1, 25.0, 25.0), (2, -5.0, -5.0)],
        ["pid", "long", "lat"],
    ).select("pid", F.col("long"), F.col("lat"))
    via_jdbc = assign_region(
        pts, load_polygons_jdbc(spark, url, table="regions", driver=DRIVER)
    )
    via_file = assign_region(
        pts, polygons_from_wkb([(n, b) for n, b in rows])
    )
    a = {(r["pid"], r["region"]) for r in via_jdbc.collect()}
    b = {(r["pid"], r["region"]) for r in via_file.collect()}
    assert a == b == {(0, "MAINLAND"), (1, "ISLAND"), (2, None)}


def test_jdbc_arg_validation(spark):
    with pytest.raises(ValueError):
        load_polygons_jdbc(spark, "jdbc:derby:x")
    with pytest.raises(ValueError):
        load_polygons_jdbc(
            spark, "jdbc:derby:x", table="t", query="SELECT 1"
        )


def test_config_jdbc_region_source_end_to_end(spark, derby_db):
    """region_polygons: {jdbc: {...}} in the QC config resolves lazily
    (registry region check, memoized on the config) and produces the
    same region assignment as the file-config path — the strict S5
    config surface."""
    from qualityassurancetool_spark.config import ConfigError, QCConfig
    from qualityassurancetool_spark.plans.registry import (
        run_registered_checks,
    )

    url, rows = derby_db
    cfg = QCConfig.from_dict(
        {
            "QC": [],
            "region_polygons": {
                "jdbc": {
                    "url": url,
                    "table": "regions",
                    "name_col": "name",
                    "driver": DRIVER,
                }
            },
        }
    )
    assert cfg.region_polygons is None  # deferred until a session exists
    obs = spark.createDataFrame(
        [(0, 2.0, 2.0, 0), (1, 25.0, 25.0, 0), (2, -5.0, -5.0, 0)],
        ["iot_id", "long", "lat", "qc_flag"],
    )
    got = run_registered_checks(obs, cfg, spark, checks=["region"])
    regions = {r["iot_id"]: r["region"] for r in got.collect()}
    assert regions == {0: "MAINLAND", 1: "ISLAND", 2: None}
    # memoized: the resolved polygons now live on the config
    assert [n for n, _ in cfg.region_polygons] == ["MAINLAND", "ISLAND"]

    # validation: malformed specs fail fast at config parse
    with pytest.raises(ConfigError):
        QCConfig.from_dict({"QC": [], "region_polygons": {"jdbc": {}}})
    with pytest.raises(ConfigError):
        QCConfig.from_dict(
            {"QC": [], "region_polygons": {"jdbc": {
                "url": "x", "table": "t", "query": "SELECT 1",
            }}}
        )
