"""SURVEY.md §2 round-9 twenty-fifth wave (queued for the r10 window)
— the Spark 4.1 geospatial WKB surface and window_time:

- ``st_wkb_surface`` — the new GEOMETRY/GEOGRAPHY types' WKB
  boundary: st_geomfromwkb / st_geogfromwkb round-tripped through
  st_asbinary byte-identically, st_srid / st_setsrid metadata —
  gated behind the ``spark.sql.geospatial.enabled`` runtime flag the
  query sets itself.
- ``window_time_semantics`` — the window_time() accessor on tumbling
  windows: the event-time column a chained windowed aggregation
  groups on (inclusive end − 1 µs — using window.end would silently
  shift every chained window by one slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

#: little-endian WKB for POINT(1 2), POINT(-3.5 4.25), POINT(0 0)
WKB_POINTS = (
    "0101000000000000000000F03F0000000000000040",
    "01010000000000000000000CC00000000000001140",
    "010100000000000000000000000000000000000000",
)

_ST_ORACLE = (
    "SELECT "
    + ", ".join(
        f"'{w.lower()}' AS geom_rt_{i}, '{w.lower()}' AS geog_rt_{i}"
        for i, w in enumerate(WKB_POINTS)
    )
    + ", CAST(0 AS BIGINT) AS default_srid,"
    " CAST(4326 AS BIGINT) AS set_srid"
)


@query("st_wkb_surface", oracle=_ST_ORACLE)
def st_wkb_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4.1 geospatial type boundary: three WKB point
    literals (positive, negative/fractional, origin) parsed to
    GEOMETRY and GEOGRAPHY and serialized back with st_asbinary —
    the round trip must be byte-identical (hex-compared), proving
    the codec is lossless at the storage boundary; st_srid reads the
    default (0) and st_setsrid stamps EPSG:4326. The geospatial
    feature flag is runtime-set by the query itself (the driver's
    plain session has it off). Spatial predicates/measures are not
    in this Spark build — the type codec boundary IS the public
    surface, covered exactly."""
    spark.conf.set("spark.sql.geospatial.enabled", "true")
    cols = []
    for i, w in enumerate(WKB_POINTS):
        cols.append(
            F.expr(f"lower(hex(st_asbinary(st_geomfromwkb(x'{w}'))))")
            .alias(f"geom_rt_{i}")
        )
        cols.append(
            F.expr(f"lower(hex(st_asbinary(st_geogfromwkb(x'{w}'))))")
            .alias(f"geog_rt_{i}")
        )
    w0 = WKB_POINTS[0]
    cols.append(
        F.expr(f"st_srid(st_geomfromwkb(x'{w0}'))")
        .cast("long")
        .alias("default_srid")
    )
    cols.append(
        F.expr(f"st_srid(st_setsrid(st_geomfromwkb(x'{w0}'), 4326))")
        .cast("long")
        .alias("set_srid")
    )
    return spark.range(1).select(*cols)


_WT_ORACLE = """
WITH w AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1)
SELECT ws AS window_start,
       ws + INTERVAL 1 HOUR AS window_end,
       ws + INTERVAL 1 HOUR - INTERVAL 1 MICROSECOND AS event_time,
       n
FROM w ORDER BY window_start
"""


@query("window_time_semantics", oracle=_WT_ORACLE)
def window_time_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """window_time() on tumbling hourly windows: the accessor returns
    the window's INCLUSIVE end (end − 1 µs) — the event-time value a
    chained windowed aggregation must group on (grouping on
    window.end instead silently lands every row in the NEXT window —
    the off-by-one-slot bug stream_chained_windows guards against in
    streaming; this is its batch twin, oracled per hour). One
    tumbling-window aggregation over events, bounded output (corpus
    hours)."""
    ev = Catalog(spark, sf_dir).events
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.expr("window_time(w)").alias("event_time"),
        "n",
    ).orderBy("window_start")
