"""Fourth wave of analytics-engine queries: the remaining TPC-H query
shapes (Q9/Q11/Q12/Q13/Q16/Q17/Q20/Q21 flavors) adapted to the test
schema (no partsupp/shipmode/commitdate columns — each query keeps the
original's *plan shape* and swaps in available columns).

Reference parity: the reference tool's query surface is ES search +
terms aggregation (Bootstrap.java:196-219); these queries generalize
that to the full relational surface a warehouse replacement needs.

Scale posture notes per query in the docstrings; common themes:
dimension sides broadcast, correlated subqueries decorrelated to
window/aggregate joins, NOT-IN rewritten to anti joins, scalar
aggregates computed once and broadcast — never per-row subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.util import broadcast_scalars
from parquet_generator_spark.sources.catalog import load_table
from parquet_generator_spark.operators import cache as _cache


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------- Q9

Q9_NAME_TOKEN = "red"
Q9_COST_RATE = 0.6  # stand-in for ps_supplycost (no partsupp table)


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 flavor: profit by supplier nation and order year for
    parts whose name contains a token. Cost is modeled as
    rate * p_retailprice * l_quantity (no partsupp in the test schema).
    The LIKE filter prunes part BEFORE the fact join (broadcast), the
    lineitem-orders join shuffles on orderkey under AQE, and
    supplier->nation is a broadcast chain."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    part = (load_table(spark, "part", sf_dir)
            .filter(F.col("p_name").contains(Q9_NAME_TOKEN))
            .select("p_partkey", "p_retailprice"))
    profit = _rev() - Q9_COST_RATE * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation", F.desc("o_year")))


Q9_ORACLE = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - {Q9_COST_RATE} * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%{Q9_NAME_TOKEN}%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# --------------------------------------------------------------- Q11

Q11_NATION = "NATION_1"
Q11_FACTOR = 1.5  # "important" = value above FACTOR x mean part value


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 flavor: parts whose revenue from one nation's
    suppliers exceeds FACTOR x the mean per-part value — a grouped
    aggregate compared against a scalar aggregate OVER THE SAME
    grouped result. The per-part frame is built once; the scalar is a
    one-row agg of it, broadcast-cross-joined (Catalyst reuses the
    exchange rather than recomputing the group-by)."""
    li = load_table(spark, "lineitem", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    supp = (load_table(spark, "supplier", sf_dir)
            .join(F.broadcast(nation.filter(F.col("n_name") == Q11_NATION)),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    pv = (li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"),
                  "left_semi")
          .groupBy(F.col("l_partkey").alias("partkey"))
          .agg(F.sum(_rev()).alias("raw_value"))
          # part-cardinality; materialize once so the scalar threshold
          # doesn't re-run the whole lineitem scan + aggregate
          .localCheckpoint().transform(_cache.track))
    thresh = pv.agg((Q11_FACTOR * F.avg("raw_value")).alias("thresh"))
    return (broadcast_scalars(pv, thresh)
            .filter(F.col("raw_value") > F.col("thresh"))
            .select("partkey", F.round("raw_value", 2).alias("value"))
            .orderBy(F.desc("value"), "partkey"))


Q11_ORACLE = f"""
WITH pv AS (
  SELECT l_partkey AS partkey,
         sum(l_extendedprice * (1 - l_discount)) AS raw_value
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = '{Q11_NATION}')
  GROUP BY partkey)
SELECT partkey, round(raw_value, 2) AS value
FROM pv
WHERE raw_value > (SELECT {Q11_FACTOR} * avg(raw_value) FROM pv)
ORDER BY value DESC, partkey
"""


# --------------------------------------------------------------- Q12


def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 flavor: per line status, how many 1996-shipped lines
    belong to critical-priority orders vs not — conditional counts
    (sum-of-CASE) over a fact-fact join. The date filter reaches the
    lineitem scan; the join shuffles on orderkey; counting is
    map-side partial."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(F.sum(F.when(crit, 1).otherwise(0)).alias("high_count"),
             F.sum(F.when(crit, 0).otherwise(1)).alias("low_count"))
        .orderBy("linestatus"))


Q12_ORACLE = """
SELECT l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY linestatus ORDER BY linestatus
"""


# --------------------------------------------------------------- Q13


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 flavor: distribution of customers by how many
    non-urgent orders they placed — a LEFT OUTER join with a join-side
    residual predicate, then two aggregation levels (per-customer
    count, then histogram of counts). Zero-order customers must
    survive as c_count=0, which is why the filter lives in the join
    condition, not a WHERE."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    per_cust = (cust.join(
        orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------- Q16

Q16_EXCLUDED_TYPE = "ECONOMY"
Q16_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 flavor: how many distinct suppliers shipped each
    (brand, size) of non-excluded parts, excluding suppliers in
    arrears — lineitem stands in for partsupp as the part-supplier
    relation. NOT IN (subquery) is rewritten as a broadcast anti join
    (safe here: s_suppkey is non-null); countDistinct shuffles on the
    group key with partial distinct aggregation map-side."""
    li = load_table(spark, "lineitem", sf_dir)
    part = (load_table(spark, "part", sf_dir)
            .filter((F.col("p_type") != Q16_EXCLUDED_TYPE)
                    & F.col("p_size").isin(*Q16_SIZES))
            .select("p_partkey", "p_brand", "p_size"))
    bad_supp = (load_table(spark, "supplier", sf_dir)
                .filter(F.col("s_acctbal") < 0.0)
                .select("s_suppkey"))
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size"))


Q16_ORACLE = f"""
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> '{Q16_EXCLUDED_TYPE}'
  AND p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


# --------------------------------------------------------------- Q17

Q17_BRAND = "Brand#13"


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 flavor: average yearly revenue lost if small-quantity
    orders (below 20% of that part's mean order quantity) for one
    brand went unfilled. The correlated per-part AVG subquery is
    decorrelated into a window average over the brand-filtered join
    output (every lineitem row of a part carries the same brand, so
    filtering first is semantics-preserving and keeps the window
    input small)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = (load_table(spark, "part", sf_dir)
            .filter(F.col("p_brand") == Q17_BRAND)
            .select("p_partkey"))
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_lines")))


Q17_ORACLE = f"""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = '{Q17_BRAND}'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# --------------------------------------------------------------- Q20

Q20_NAME_PREFIX = "hot"
Q20_NATION = "NATION_2"
Q20_MIN_QTY = 100.0


def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 flavor: suppliers in one nation who shipped a bulk
    quantity of a name-prefixed part family during 1996 — the
    original's nested IN-chain (part -> partsupp -> supplier)
    expressed as a HAVING aggregate feeding a left-semi join.
    Everything left of the semi join is supplier-cardinality."""
    li = load_table(spark, "lineitem", sf_dir)
    part = (load_table(spark, "part", sf_dir)
            .filter(F.col("p_name").startswith(Q20_NAME_PREFIX))
            .select("p_partkey"))
    nation = load_table(spark, "nation", sf_dir)
    bulk = (li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > Q20_MIN_QTY))
    return (load_table(spark, "supplier", sf_dir)
            .join(F.broadcast(nation.filter(F.col("n_name") == Q20_NATION)),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(bulk, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


Q20_ORACLE = f"""
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = '{Q20_NATION}'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE '{Q20_NAME_PREFIX}%')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > {Q20_MIN_QTY})
ORDER BY s_suppkey
"""


# --------------------------------------------------------------- Q21

Q21_LATE_DAYS = 60
Q21_TOPN = 20


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 flavor: suppliers who were the SOLE late shipper on a
    finished multi-supplier order ("late" = shipped > N days after
    order date; the schema has no commit/receipt dates). The
    original's EXISTS (another supplier) + NOT EXISTS (another late
    supplier) pair collapses into per-order aggregates — and the two
    COUNT(DISTINCT)s run as a TWO-LEVEL aggregate (per (order,
    supplier) flags first, then per order) instead of Catalyst's
    EXPAND plan, which would triple the shuffled rows."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = (load_table(spark, "orders", sf_dir)
              .filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey", "o_orderdate"))
    supp = load_table(spark, "supplier", sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {Q21_LATE_DAYS} DAYS")
    per_pair = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late_any")))
    per_order = (
        per_pair.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"),
             F.sum(F.col("late_any").cast("long")).alias("n_late_supp"),
             F.max(F.when(F.col("late_any"), F.col("l_suppkey")))
             .alias("late_supp")))
    return (per_order
            .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
            .groupBy("late_supp")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .join(F.broadcast(supp.select("s_suppkey", "s_name")),
                  F.col("late_supp") == F.col("s_suppkey"))
            .select("s_name", "numwait")
            .orderBy(F.desc("numwait"), "s_name")
            .limit(Q21_TOPN))


Q21_ORACLE = f"""
WITH li AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'),
per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp,
         max(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM li GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT {Q21_TOPN}
"""


# ------------------------------------------------- grouping sets


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (a la carte subtotals, unlike ROLLUP's
    prefix chain or CUBE's full lattice): per-(flag,status) detail,
    per-flag subtotal, and grand total in one pass — all sets expand
    map-side, one shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n_rows")))


GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                        (l_returnflag), ())
"""


# ------------------------------------------------------ unpivot


def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (unpivot/melt) of lineitem measures, then
    per-(flag, measure) averages — the inverse of pivot. The unpivot
    is a zero-shuffle map-side expand (each row emits one row per
    measure); only the final aggregate shuffles."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure", "val")
        .groupBy("l_returnflag", "measure")
        .agg(F.round(F.avg("val"), 4).alias("avg_val"),
             F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag", "measure"))


UNPIVOT_ORACLE = """
WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val
  FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
SELECT l_returnflag, measure,
       round(avg(val), 4) AS avg_val, count(*) AS n
FROM long GROUP BY l_returnflag, measure
ORDER BY l_returnflag, measure
"""


# ------------------------------------------------- window functions


def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family in one frame: rank /
    dense_rank / percent_rank / cume_dist plus lag over customers by
    balance within market segment. One shuffle on the partition key;
    all functions share the single sorted pass."""
    cust = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey"))
    return (cust
            .withColumn("rnk", F.rank().over(w))
            .withColumn("drnk", F.dense_rank().over(w))
            .withColumn("prnk", F.round(F.percent_rank().over(w), 4))
            .withColumn("cdist", F.round(F.cume_dist().over(w), 4))
            .withColumn("gap_above", F.round(
                F.lag("c_acctbal", 1).over(w) - F.col("c_acctbal"), 2))
            .filter(F.col("rnk") <= 10)
            .select("c_mktsegment", "c_custkey",
                    F.round("c_acctbal", 2).alias("acctbal"),
                    "rnk", "drnk", "prnk", "cdist", "gap_above")
            .orderBy("c_mktsegment", "rnk"))


WINDOW_RANKS_ORACLE = """
SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS acctbal,
       rnk, drnk, prnk, cdist, gap_above
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         CAST(rank() OVER w AS INT) AS rnk,
         CAST(dense_rank() OVER w AS INT) AS drnk,
         round(percent_rank() OVER w, 4) AS prnk,
         round(cume_dist() OVER w, 4) AS cdist,
         round(lag(c_acctbal, 1) OVER w - c_acctbal, 2) AS gap_above
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC))
WHERE rnk <= 10
ORDER BY c_mktsegment, rnk
"""


def corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: Pearson correlation and
    sample covariance of quantity vs extended price, sample stddev,
    and the exact median — all single-pass built-in aggregates (the
    median swaps to percentile_approx's t-digest at 100 TB)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 4)
                 .alias("qty_price_corr"),
                 F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2)
                 .alias("qty_price_covar"),
                 F.round(F.stddev_samp("l_extendedprice"), 2)
                 .alias("price_stddev"),
                 F.round(F.expr("percentile(l_quantity, 0.5)"), 2)
                 .alias("qty_median"))
            .orderBy("l_returnflag"))


CORR_STATS_ORACLE = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 2)
         AS qty_price_covar,
       round(stddev_samp(l_extendedprice), 2) AS price_stddev,
       round(quantile_cont(l_quantity, 0.5), 2) AS qty_median
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --------------------------------------------------- forward fill


def forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series imputation: treat error readings as missing and
    forward-fill each user's value from their last good event —
    last(ignorenulls) over an unbounded-preceding window, one shuffle
    on the entity key, one sorted pass."""
    ev = load_table(spark, "events", sf_dir)
    w = (Window.partitionBy("user_id")
         .orderBy(F.asc("ts"), F.asc("event_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    good = F.when(F.col("event_type") != "error", F.col("value"))
    return (ev.withColumn("filled",
                          F.round(F.last(good, ignorenulls=True).over(w), 2))
            .select("event_id", "user_id", "event_type",
                    F.round("value", 2).alias("value"), "filled")
            .orderBy("event_id"))


FORWARD_FILL_ORACLE = """
SELECT event_id, user_id, event_type, round(value, 2) AS value,
       round(last_value(CASE WHEN event_type <> 'error' THEN value END
                        IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             2) AS filled
FROM events
ORDER BY event_id
"""


# ------------------------------------------------- SQL front end


def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front end: register the table as a view and run the
    EXACT ANSI text the DuckDB oracle runs (TPC-H Q1) through
    spark.sql — dialect-neutral SQL is portable across both engines
    verbatim, and Catalyst plans it identically to the DataFrame
    build of q1_pricing_summary."""
    from parquet_generator_spark.plans.analytics import Q1_ORACLE
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView(
        "lineitem")
    return spark.sql(Q1_ORACLE)


def _sql_interface_oracle() -> str:
    from parquet_generator_spark.plans.analytics import Q1_ORACLE
    return Q1_ORACLE


SQL_INTERFACE_ORACLE = _sql_interface_oracle()


# ---------------------------------------- rolling time-range window

ROLL_HOURS = 48
_ROLL_US = ROLL_HOURS * 3600 * 1_000_000


def rolling_window_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 48-hour event features via a time-RANGE
    window frame — the standard time-series feature-engineering op
    (fraud velocity, engagement momentum). RANGE (not ROWS) frames
    are value-bounded: every event sees exactly the trailing 48h of
    its user's activity regardless of event density. Frame ordering
    is integer MICROSECONDS on both engines (unix_micros here,
    epoch_us in the oracle) so sub-second timestamps bound the frame
    identically. One shuffle on user_id; the frame scan is linear
    per partition (Spark keeps a sliding frame for RANGE windows).
    """
    ev = load_table(spark, "events", sf_dir)
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts")))
         .rangeBetween(-_ROLL_US, 0))
    return (ev.select(
                "event_id", "user_id",
                F.count(F.lit(1)).over(w).alias("roll_cnt"),
                F.round(F.sum("value").over(w), 2).alias("roll_sum"))
            .orderBy("event_id"))


ROLLING_WINDOW_ORACLE = f"""
SELECT event_id, user_id,
       count(*) OVER w AS roll_cnt,
       round(sum(value) OVER w, 2) AS roll_sum
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {_ROLL_US} PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


QUERIES = {
    "sql_interface": sql_interface,
    "rolling_window_features": rolling_window_features,
    "forward_fill": forward_fill,
    "window_ranks": window_ranks,
    "corr_stats": corr_stats,
    "grouping_sets_agg": grouping_sets_agg,
    "unpivot_melt": unpivot_melt,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q12_priority_lines": q12_priority_lines,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_variety": q16_supplier_variety,
    "q17_small_quantity": q17_small_quantity,
    "q20_bulk_suppliers": q20_bulk_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "sql_interface": SQL_INTERFACE_ORACLE,
    "rolling_window_features": ROLLING_WINDOW_ORACLE,
    "forward_fill": FORWARD_FILL_ORACLE,
    "window_ranks": WINDOW_RANKS_ORACLE,
    "corr_stats": CORR_STATS_ORACLE,
    "grouping_sets_agg": GROUPING_SETS_ORACLE,
    "unpivot_melt": UNPIVOT_ORACLE,
    "q9_product_profit": Q9_ORACLE,
    "q11_important_parts": Q11_ORACLE,
    "q12_priority_lines": Q12_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "q16_supplier_variety": Q16_ORACLE,
    "q17_small_quantity": Q17_ORACLE,
    "q20_bulk_suppliers": Q20_ORACLE,
    "q21_waiting_suppliers": Q21_ORACLE,
}
