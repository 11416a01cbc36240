"""Second wave of analytics-engine queries: argmin-per-group,
(anti/semi) EXISTS joins, rollup, running windows, exact percentiles,
as-of join, and a bucketed range join.

Each generalizes a query family the reference's ES DSL surface implies
(top-hits per bucket, filtered counts, date math over event streams)
into full engine capabilities. All joins leave SF-scaled tables to
AQE; only fixed-size dims are broadcast. As-of and range joins are
expressed with the shuffle-friendly union-window / bucket-join
patterns rather than inequality joins, so they survive 100 TB inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table


def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 flavor: per size-15 part, the supplier with the lowest
    average unit price (argmin via agg -> window rank, tie-break on
    suppkey)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    sized = part.filter(F.col("p_size") == 15)
    # pre-filter the fact rows to qualifying parts (broadcast semi
    # join) BEFORE the heavy aggregation: the selective part filter
    # can't be pushed through the groupBy by the optimizer, so without
    # this the agg shuffles ~50x more groups than can ever survive
    li_sized = li.join(F.broadcast(sized.select("p_partkey")),
                       F.col("l_partkey") == F.col("p_partkey"),
                       "left_semi")
    unit = (li_sized.groupBy("l_partkey", "l_suppkey")
            .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4)
                 .alias("avg_unit")))
    w = Window.partitionBy("l_partkey").orderBy(
        F.asc("avg_unit"), F.asc("l_suppkey"))
    return (unit.join(sized, F.col("l_partkey") == F.col("p_partkey"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("p_partkey"), F.col("p_name"),
                    F.col("l_suppkey").alias("best_suppkey"),
                    F.col("avg_unit").alias("best_price"))
            .orderBy("p_partkey"))


Q2_ORACLE = """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         round(avg(l_extendedprice / l_quantity), 4) AS avg_unit
  FROM lineitem GROUP BY l_partkey, l_suppkey),
ranked AS (
  SELECT p_partkey, p_name, l_suppkey, avg_unit,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY avg_unit ASC, l_suppkey ASC) AS rk
  FROM unit JOIN part ON l_partkey = p_partkey
  WHERE p_size = 15)
SELECT p_partkey, p_name, l_suppkey AS best_suppkey,
       avg_unit AS best_price
FROM ranked WHERE rk = 1 ORDER BY p_partkey
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor: orders in a quarter having at least one
    lineitem shipped after the order date (EXISTS -> left-semi join
    with a non-equi residual), counted per priority."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    q = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp")))
    return (q.join(li,
                   (F.col("o_orderkey") == F.col("l_orderkey"))
                   & (F.col("l_shipdate") > F.col("o_orderdate")),
                   "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 flavor: top-20 customers by revenue lost to returns
    in 1996H2. customer joins by AQE choice; nation broadcast."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20))


Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via ROLLUP(l_returnflag, l_linestatus):
    leaf rows + per-flag subtotals + grand total in one pass (Spark
    expands the grouping sets map-side; a single shuffle)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.rollup("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("sum_revenue"),
                 F.count(F.lit(1)).alias("n_rows")))


ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of event value per
    event type — Spark's percentile() and DuckDB's quantile_cont use
    the same linear-interpolation definition. At 100 TB swap in
    percentile_approx (t-digest) — same plan shape, bounded memory."""
    ev = load_table(spark, "events", sf_dir)
    pct = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    return (ev.groupBy("event_type")
            .agg(pct.alias("pcts"), F.count(F.lit(1)).alias("n"))
            .select("event_type",
                    F.round(F.col("pcts")[0], 4).alias("p50"),
                    F.round(F.col("pcts")[1], 4).alias("p90"),
                    F.round(F.col("pcts")[2], 4).alias("p99"),
                    "n")
            .orderBy("event_type"))


PERCENTILES_ORACLE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.9), 4)  AS p90,
       round(quantile_cont(value, 0.99), 4) AS p99,
       count(*) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running aggregates over the purchase stream: cumulative
    spend, 3-event moving average, event index. One shuffle on
    user_id serves all three window functions."""
    ev = load_table(spark, "events", sf_dir)
    pur = ev.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (pur.select(
        "event_id", "user_id",
        F.round(F.sum("value").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
        .alias("running_spend"),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4)
        .alias("moving_avg3"),
        F.row_number().over(w).alias("purchase_idx"))
        .orderBy("event_id"))


WINDOW_RUNNING_ORACLE = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_spend,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS moving_avg3,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS purchase_idx
FROM events WHERE event_type = 'purchase'
ORDER BY event_id
"""


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks the value of the latest click
    by the same user at-or-before the purchase time.

    Spark has no ASOF JOIN; the scalable expression is the
    union-then-window pattern: tag both streams, one shuffle on
    user_id, last(click_value, ignoreNulls) over the time-ordered
    frame. No inequality join, no per-key explosion.
    """
    ev = load_table(spark, "events", sf_dir)
    both = (ev.filter(F.col("event_type").isin("click", "purchase"))
            .select("event_id", "user_id", "ts", "value",
                    F.when(F.col("event_type") == "click", 0).otherwise(1)
                    .alias("kind"),
                    F.when(F.col("event_type") == "click", F.col("value"))
                    .alias("click_value")))
    w = (Window.partitionBy("user_id")
         .orderBy(F.asc("ts"), F.asc("kind"), F.asc("event_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (both.withColumn(
        "last_click_value", F.last("click_value", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("event_id", "user_id",
                F.col("value").alias("purchase_value"),
                "last_click_value")
        .orderBy("event_id"))


ASOF_ORACLE = """
WITH u AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
         CASE WHEN event_type = 'click' THEN value END AS click_value
  FROM events WHERE event_type IN ('click', 'purchase')),
w AS (
  SELECT *, last_value(click_value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, kind, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS last_click_value
  FROM u)
SELECT event_id, user_id, value AS purchase_value, last_click_value
FROM w WHERE kind = 1 ORDER BY event_id
"""


RANGE_WINDOW_SECONDS = 3600


def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks by the same user within the hour before each
    purchase.

    A naive inequality join is O(N*M) per user; the scale pattern is
    time-bucketing: each click lands in ONE floor(ts/1h) bucket, each
    purchase probes its own and the previous bucket (covering the 1 h
    look-back), so the join is a plain equi-join on (user, bucket)
    with a residual time filter — shuffle-partitionable and
    skew-splittable like any other equi-join.
    """
    ev = load_table(spark, "events", sf_dir)
    sec = F.col("ts").cast("double")
    bucket = F.floor(sec / RANGE_WINDOW_SECONDS)
    clk = (ev.filter(F.col("event_type") == "click")
           .select("user_id", sec.alias("c_sec"), bucket.alias("bucket")))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("event_id", "user_id", sec.alias("p_sec"),
                   F.explode(F.array(bucket - 1, bucket)).alias("bucket")))
    return (pur.join(clk, ["user_id", "bucket"])
            .filter((F.col("c_sec") <= F.col("p_sec"))
                    & (F.col("c_sec") >= F.col("p_sec") - RANGE_WINDOW_SECONDS))
            .groupBy("event_id")
            .agg(F.count(F.lit(1)).alias("n_clicks_1h"))
            .orderBy("event_id"))


RANGE_JOIN_ORACLE = f"""
SELECT p.event_id, count(*) AS n_clicks_1h
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch(c.ts) <= epoch(p.ts)
 AND epoch(c.ts) >= epoch(p.ts) - {RANGE_WINDOW_SECONDS}
GROUP BY p.event_id ORDER BY p.event_id
"""


QUERIES = {
    "q2_cheapest_supplier": q2_cheapest_supplier,
    "q4_order_priority": q4_order_priority,
    "q10_returned_items": q10_returned_items,
    "rollup_agg": rollup_agg,
    "percentiles_exact": percentiles_exact,
    "window_running": window_running,
    "asof_join": asof_join,
    "range_join_bucketed": range_join_bucketed,
}

ORACLES = {
    "q2_cheapest_supplier": Q2_ORACLE,
    "q4_order_priority": Q4_ORACLE,
    "q10_returned_items": Q10_ORACLE,
    "rollup_agg": ROLLUP_ORACLE,
    "percentiles_exact": PERCENTILES_ORACLE,
    "window_running": WINDOW_RUNNING_ORACLE,
    "asof_join": ASOF_ORACLE,
    "range_join_bucketed": RANGE_JOIN_ORACLE,
}
