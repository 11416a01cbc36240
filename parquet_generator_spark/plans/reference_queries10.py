"""ES-DSL ninth tranche: the parent-child join queries (`has_child`,
`has_parent`) over the natural orders->lineitem relation, and the
`geotile_grid` geo bucketing agg over the runtime-field coordinates.

Scale posture: has_child/has_parent are LEFT SEMI joins on the join
key (the plan ES's own parent-child execution approximates with its
global-ordinals join) — pushdown-friendly, shuffle on the key, no
row multiplication; geotile bucketing is pure floor/log arithmetic
per row (the slippy-map tile formula), one grouped pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.plans.reference_queries9 import (
    LAT_D,
    LAT_S,
    LON_D,
    LON_S,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

CHILD_QTY = 45.0
MIN_CHILDREN = 2


def dsl_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`has_child` query with `min_children`: orders having at least
    MIN_CHILDREN lineitem children matching the inner query
    (quantity >= 45). The matching-children count is a grouped
    aggregate on the child side (map-side partial), then one semi
    join back to the parents — parent rows never multiply."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    matching = (li.filter(F.col("l_quantity") >= CHILD_QTY)
                .groupBy("l_orderkey")
                .agg(F.count(F.lit(1)).alias("nch"))
                .filter(F.col("nch") >= MIN_CHILDREN))
    return (orders.join(matching.withColumnRenamed(
        "l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey"))


DSL_HAS_CHILD_ORACLE = f"""
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  WHERE l_quantity >= {CHILD_QTY}
  GROUP BY l_orderkey HAVING count(*) >= {MIN_CHILDREN})
ORDER BY o_orderkey
"""


def dsl_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`has_parent` query + terms agg: lineitem children whose parent
    order matches (priority 1-URGENT), faceted by return flag — one
    semi join from the filtered parent keys, one grouped pass."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    urgent = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_orderkey").alias("l_orderkey")))
    kids = li.join(urgent, "l_orderkey", "left_semi")
    return (kids.groupBy(F.col("l_returnflag").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"))
            .orderBy(F.desc("doc_count"), F.asc("key")))


DSL_HAS_PARENT_ORACLE = """
SELECT l_returnflag AS key, count(*) AS doc_count,
       round(avg(l_quantity), 4) AS avg_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY key ORDER BY doc_count DESC, key ASC
"""


TILE_ZOOM = 5


def _tile_exprs(lat: str, lon: str) -> tuple[str, str]:
    n = 1 << TILE_ZOOM
    x = f"CAST(floor((({lon}) + 180.0) / 360.0 * {n}) AS BIGINT)"
    y = (f"CAST(floor((1.0 - ln(tan(radians({lat})) + "
         f"1.0 / cos(radians({lat}))) / pi()) / 2.0 * {n}) AS BIGINT)")
    return x, y


def dsl_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geotile_grid` agg at zoom 5: events bucketed into slippy-map
    (Web Mercator z/x/y) tiles via the standard tile formula — pure
    per-row floor/log arithmetic identical on both engines, then one
    grouped pass with the ES bucket ordering."""
    ev = load_table(spark, "events", sf_dir)
    x, y = _tile_exprs(LAT_S, LON_S)
    key = F.concat_ws("/", F.lit(TILE_ZOOM), F.expr(x), F.expr(y))
    return (ev.groupBy(key.alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc("key")))


def _geotile_oracle() -> str:
    x, y = _tile_exprs(LAT_D, LON_D)
    return f"""
SELECT concat({TILE_ZOOM}, '/', {x}, '/', {y}) AS key,
       count(*) AS doc_count
FROM events GROUP BY key ORDER BY doc_count DESC, key ASC
"""


QUERIES.update({
    "dsl_has_child": dsl_has_child,
    "dsl_has_parent": dsl_has_parent,
    "dsl_geotile_grid": dsl_geotile_grid,
})
ORACLES.update({
    "dsl_has_child": DSL_HAS_CHILD_ORACLE,
    "dsl_has_parent": DSL_HAS_PARENT_ORACLE,
    "dsl_geotile_grid": _geotile_oracle(),
})
