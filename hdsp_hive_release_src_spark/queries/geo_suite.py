"""SURVEY.md §2.2 round-7 — geospatial-lite analytics. Neither Hive
nor Spark ships native geo types (production uses ESRI/Sedona UDFs),
but the workhorse computations — great-circle distance, ring/grid
bucketing, nearest-hub assignment — are pure trigonometry that a
SQL engine must still run at scale. Coordinates are synthesized
deterministically from keys so the oracle replays them exactly.

Float posture: every value is per-row scalar trig (sin/cos/asin over
the same IEEE doubles in both engines) — no accumulation anywhere; the
only aggregates are integer counts and min/max of already-rounded
values, so partition order cannot move the output (the rounding-audit
contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query

#: earth radius (km) and ring width (km), shared with the oracle.
_EARTH_R = "6371.0"
_RING_KM = "2000.0"

# deterministic synthetic coordinates from the customer key: spread
# over (-60..60) lat, (-180..180) lon — identical text in both engines
_LAT = "(CAST(c_custkey % 120 AS DOUBLE) - 60.0 + 0.25)"
_LON = "(CAST((c_custkey * 7) % 360 AS DOUBLE) - 180.0 + 0.25)"

#: haversine great-circle distance (km) from (lat, lon) to (0, 0),
#: written once and interpolated into BOTH engines' SQL so the
#: expression trees are identical.
_DIST = (
    f"2.0 * {_EARTH_R} * asin(sqrt("
    f"pow(sin(radians({_LAT}) / 2.0), 2) + "
    f"cos(radians({_LAT})) * cos(radians(0.0)) * "
    f"pow(sin(radians({_LON}) / 2.0), 2)))"
)


@query(
    "geo_haversine_rings",
    oracle=f"""
    WITH d AS (
      SELECT c_custkey, c_mktsegment, {_DIST} AS dist_km
      FROM customer)
    SELECT CAST(floor(dist_km / {_RING_KM}) AS BIGINT) AS ring,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
           round(min(dist_km), 3) AS ring_min_km,
           round(max(dist_km), 3) AS ring_max_km
    FROM d GROUP BY ring ORDER BY ring
    """,
)
def geo_haversine_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle distance rings: haversine distance from every
    customer's (synthesized) coordinates to a reference point, bucketed
    into {RING}km rings — the geo-cohorting shape (delivery zones,
    latency rings, catchment areas). The haversine expression is ONE
    shared string interpolated into both engines, so parity verifies
    the trig pipeline itself. Ring assignment is floor division of a
    per-row scalar; the aggregation carries integer counts and min/max
    of the per-row value — nothing order-sensitive. At scale: map-side
    expression + one integer-keyed shuffle."""
    c = Catalog(spark, sf_dir).customer
    dist = F.expr(_DIST)
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            dist.alias("dist_km"),
        )
        .groupBy(
            F.floor(F.col("dist_km") / float(_RING_KM))
            .cast("long")
            .alias("ring")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.count_distinct("c_mktsegment")
            .cast("long")
            .alias("n_segments"),
            F.round(F.min("dist_km"), 3).alias("ring_min_km"),
            F.round(F.max("dist_km"), 3).alias("ring_max_km"),
        )
        .orderBy("ring")
    )


#: fixed hub locations (name, lat, lon) — broadcast-joined dimension.
_HUBS = (
    ("hub_eu", 50.0, 10.0),
    ("hub_us", 40.0, -100.0),
    ("hub_apac", 10.0, 110.0),
    ("hub_sa", -20.0, -60.0),
)


def _hub_dist(lat2: float, lon2: float) -> str:
    return (
        f"2.0 * {_EARTH_R} * asin(sqrt("
        f"pow(sin((radians({_LAT}) - radians({lat2})) / 2.0), 2) + "
        f"cos(radians({_LAT})) * cos(radians({lat2})) * "
        f"pow(sin((radians({_LON}) - radians({lon2})) / 2.0), 2)))"
    )


def _nearest_hub_oracle() -> str:
    hub_rows = " UNION ALL ".join(
        f"SELECT c_custkey, '{n}' AS hub, {_hub_dist(la, lo)} AS dk"
        " FROM customer"
        for n, la, lo in _HUBS
    )
    return f"""
    WITH hd AS ({hub_rows}),
    best AS (
      SELECT c_custkey, hub, dk,
             row_number() OVER (PARTITION BY c_custkey
                 ORDER BY round(dk, 6), hub) AS rn
      FROM hd)
    SELECT hub,
           CAST(count(*) AS BIGINT) AS n_assigned,
           round(min(dk), 3) AS nearest_km,
           round(max(dk), 3) AS farthest_km
    FROM best WHERE rn = 1 GROUP BY hub ORDER BY hub
    """


@query("nearest_hub_assignment", oracle=_nearest_hub_oracle())
def nearest_hub_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-hub assignment (the geo version of IVF cell
    assignment): each customer is assigned to the closest of a fixed
    hub dimension by great-circle distance, with the per-hub
    population and distance envelope reported. The hub table is a
    literal broadcast — the assignment is a map-side argmin over 4
    candidate expressions (no shuffle until the final hub rollup),
    exactly how a 100 TB geo-partition step runs. Ties break on the
    6dp-rounded distance then hub name, mirrored in the oracle's
    window ordering."""
    c = Catalog(spark, sf_dir).customer
    hub_structs = F.array(
        *[
            F.struct(
                F.round(F.expr(_hub_dist(la, lo)), 6).alias("dk_r"),
                F.lit(n).alias("hub"),
                F.expr(_hub_dist(la, lo)).alias("dk"),
            )
            for n, la, lo in _HUBS
        ]
    )
    best = c.select(
        "c_custkey",
        F.array_min(hub_structs).alias("b"),
    ).select(
        "c_custkey",
        F.col("b.hub").alias("hub"),
        F.col("b.dk").alias("dk"),
    )
    return (
        best.groupBy("hub")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assigned"),
            F.round(F.min("dk"), 3).alias("nearest_km"),
            F.round(F.max("dk"), 3).alias("farthest_km"),
        )
        .orderBy("hub")
    )
