"""Analytics, sixth wave: market-basket association mining.

Orders are baskets, parts are items: pair support / confidence /
lift over lineitem. The pair expansion is a self-equi-join on the
basket key — TPC-H baskets are bounded (~4-7 items), so the fan-out
is C(k,2) per order, never corpus-quadratic; counts aggregate with
map-side partials, and ratio metrics are emitted as SINGLE divisions
of exact int64 products so both engines produce bit-identical
doubles (no rounding step to disagree on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.util import broadcast_scalars
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

BASKET_MIN_PAIR = 2     # min pair support (absolute baskets)
BASKET_TOPK = 20


def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchase pairs by lift. Plan: distinct (order, part)
    once; item frequencies = one grouped pass; pair counts = a
    basket-key self-join (bounded per-basket fan-out) + one grouped
    pass; the scalar basket count enters as a plan literal
    (broadcast_scalars — no nested-loop cross join in the plan
    text); the two item-frequency joins stay plain equi-joins (AQE
    picks broadcast when the item dimension fits). Lift/confidence/
    support are single int64-product divisions — cross-engine
    bit-identical, unrounded."""
    li = (load_table(spark, "lineitem", sf_dir)
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("l_partkey").alias("item"))
          .distinct())
    n_baskets = li.select(F.countDistinct("okey").alias("n"))
    items = li.groupBy("item").agg(F.count(F.lit(1)).alias("item_cnt"))
    a = li.select("okey", F.col("item").alias("item_a"))
    b = li.select("okey", F.col("item").alias("item_b"))
    pairs = (a.join(b, "okey")
             .filter(F.col("item_a") < F.col("item_b"))
             .groupBy("item_a", "item_b")
             .agg(F.count(F.lit(1)).alias("pair_cnt"))
             .filter(F.col("pair_cnt") >= BASKET_MIN_PAIR))
    enriched = broadcast_scalars(
        pairs
        .join(items.select(F.col("item").alias("item_a"),
                           F.col("item_cnt").alias("cnt_a")),
              "item_a")
        .join(items.select(F.col("item").alias("item_b"),
                           F.col("item_cnt").alias("cnt_b")),
              "item_b"),
        n_baskets)
    support = F.col("pair_cnt").cast("double") / F.col("n")
    confidence = F.col("pair_cnt").cast("double") / F.col("cnt_a")
    lift = ((F.col("pair_cnt") * F.col("n")).cast("double")
            / (F.col("cnt_a") * F.col("cnt_b")))
    return (enriched.select(
        "item_a", "item_b", "pair_cnt", "cnt_a", "cnt_b",
        support.alias("support"), confidence.alias("confidence"),
        lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("item_a"), F.asc("item_b"))
        .limit(BASKET_TOPK))


BASKET_LIFT_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS item
  FROM lineitem),
n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM li),
items AS (
  SELECT item, CAST(count(*) AS BIGINT) AS item_cnt
  FROM li GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(count(*) AS BIGINT) AS pair_cnt
  FROM li a JOIN li b ON a.okey = b.okey AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {BASKET_MIN_PAIR})
SELECT p.item_a, p.item_b, p.pair_cnt,
       ia.item_cnt AS cnt_a, ib.item_cnt AS cnt_b,
       CAST(p.pair_cnt AS DOUBLE) / n.n AS support,
       CAST(p.pair_cnt AS DOUBLE) / ia.item_cnt AS confidence,
       CAST(p.pair_cnt * n.n AS DOUBLE)
         / (ia.item_cnt * ib.item_cnt) AS lift
FROM pairs p
JOIN items ia ON ia.item = p.item_a
JOIN items ib ON ib.item = p.item_b
CROSS JOIN n
ORDER BY lift DESC, item_a ASC, item_b ASC
LIMIT {BASKET_TOPK}
"""

QUERIES.update({"basket_lift": basket_lift})
ORACLES.update({"basket_lift": BASKET_LIFT_ORACLE})
