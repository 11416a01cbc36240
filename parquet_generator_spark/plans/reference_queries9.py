"""ES-DSL eighth tranche: the geo query family — `geo_distance` and
`geo_bounding_box`. The raw tables carry no coordinates, so the
queries first attach deterministic synthetic lat/lon as runtime
fields (the ES runtime-mappings workflow, dsl_runtime_field
precedent): md5-spread over user_id so every scale factor covers the
whole grid, computed identically on both engines (the
shingle-hashing recipe), so the geo predicates exercise real
haversine/box arithmetic while staying oracle-reproducible.

Scale posture: both predicates are narrow row-level expressions
(no join, no shuffle); a bounding box is four pushdown-friendly
comparisons — exactly how a geo query should reach a parquet scan
with lat/lon columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def _h_spark(pos: int) -> str:
    return (f"cast(conv(substring(md5(cast(user_id as string)), "
            f"{pos}, 4), 16, 10) AS BIGINT)")


def _h_duck(pos: int) -> str:
    return (f"CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), "
            f"{pos}, 4)) AS BIGINT)")


def _lat(h) -> str:
    return f"45.0 + ({h} % 97) * 0.1"      # 45.0 .. 54.6


def _lon(h) -> str:
    return f"5.0 + ({h} % 101) * 0.2"      # 5.0 .. 25.0


LAT_S, LON_S = _lat(_h_spark(1)), _lon(_h_spark(5))
LAT_D, LON_D = _lat(_h_duck(1)), _lon(_h_duck(5))
CENTER_LAT, CENTER_LON = 49.0, 13.0
RADIUS_KM = 250.0
EARTH_R_KM = 6371.0


def _haversine_sql(lat: str, lon: str, clat: float, clon: float) -> str:
    return (
        f"2.0 * {EARTH_R_KM!r} * asin(sqrt("
        f"pow(sin(radians(({lat}) - {clat!r}) / 2), 2) + "
        f"cos(radians({clat!r})) * cos(radians({lat})) * "
        f"pow(sin(radians(({lon}) - {clon!r}) / 2), 2)))")


def dsl_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geo_distance` query: users within RADIUS_KM of the center
    point, by haversine great-circle distance — per-user (the geo
    point is a user attribute), distance reported rounded. Both
    engines evaluate the same formula over the same md5-derived
    coordinates."""
    ev = load_table(spark, "events", sf_dir)
    users = ev.select("user_id").distinct()
    dist = _haversine_sql(LAT_S, LON_S, CENTER_LAT, CENTER_LON)
    return (users
            .withColumn("lat", F.round(F.expr(LAT_S), 4))
            .withColumn("lon", F.round(F.expr(LON_S), 4))
            .withColumn("dist_km", F.round(F.expr(dist), 1))
            .filter(F.expr(f"{dist} < {RADIUS_KM!r}"))
            .orderBy("user_id"))


DSL_GEO_DISTANCE_ORACLE = f"""
WITH users AS (SELECT DISTINCT user_id FROM events)
SELECT user_id,
       round({LAT_D}, 4) AS lat,
       round({LON_D}, 4) AS lon,
       round({_haversine_sql(LAT_D, LON_D, CENTER_LAT, CENTER_LON)},
             1) AS dist_km
FROM users
WHERE {_haversine_sql(LAT_D, LON_D, CENTER_LAT, CENTER_LON)}
      < {RADIUS_KM!r}
ORDER BY user_id
"""

BOX = {"top": 51.0, "bottom": 47.5, "left": 8.0, "right": 18.0}


def dsl_geo_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geo_bounding_box` query + a terms agg over the matching
    docs: four comparisons (the pushdown-friendly geo shape) then
    one grouped pass — the map-viewport facet count every geo UI
    issues."""
    ev = load_table(spark, "events", sf_dir)
    boxed = (ev.withColumn("lat", F.expr(LAT_S))
             .withColumn("lon", F.expr(LON_S))
             .filter((F.col("lat") <= BOX["top"])
                     & (F.col("lat") >= BOX["bottom"])
                     & (F.col("lon") >= BOX["left"])
                     & (F.col("lon") <= BOX["right"])))
    return (boxed.groupBy(F.col("event_type").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.avg("value"), 4).alias("avg_value"))
            .orderBy(F.desc("doc_count"), F.asc("key")))


DSL_GEO_BBOX_ORACLE = f"""
SELECT event_type AS key, count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM events
WHERE ({LAT_D}) <= {BOX['top']!r}
  AND ({LAT_D}) >= {BOX['bottom']!r}
  AND ({LON_D}) >= {BOX['left']!r}
  AND ({LON_D}) <= {BOX['right']!r}
GROUP BY key ORDER BY doc_count DESC, key ASC
"""

QUERIES.update({
    "dsl_geo_distance": dsl_geo_distance,
    "dsl_geo_bounding_box": dsl_geo_bounding_box,
})
ORACLES.update({
    "dsl_geo_distance": DSL_GEO_DISTANCE_ORACLE,
    "dsl_geo_bounding_box": DSL_GEO_BBOX_ORACLE,
})
