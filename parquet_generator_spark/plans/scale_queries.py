"""Scale-path queries: explicit skew handling (salted agg/join,
value-identical to the plain forms => plain-SQL oracles) and
approximate sketches (HLL distinct counts, t-digest percentiles —
approximate by design, so the driver records rows-only and the error
bound vs the exact answer is asserted in tests/test_scale_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.skew import salted_agg, salted_join
from parquet_generator_spark.sources.catalog import load_table


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals via the two-stage salted aggregation;
    value-identical to a plain GROUP BY (the oracle)."""
    ev = load_table(spark, "events", sf_dir)
    return (salted_agg(ev, "event_type", salt_from="event_id",
                       aggs={"n": F.count(F.lit(1)),
                             "sum_value": F.sum("value")})
            .select("event_type", "n",
                    F.round("sum_value", 2).alias("sum_value"))
            .orderBy("event_type"))


SKEW_AGG_ORACLE = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⨝ orders through the salt-and-replicate join, then
    revenue per order priority; value-identical to the plain join."""
    li = load_table(spark, "lineitem", sf_dir).withColumnRenamed(
        "l_orderkey", "o_orderkey")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority")
    joined = salted_join(li, orders, key="o_orderkey",
                         salt_from="l_linenumber", n_salt=8)
    return (joined.groupBy("o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy("o_orderpriority"))


SKEW_JOIN_ORACLE = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


HLL_RSD = 0.02


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based scale path: HLL++ distinct users and t-digest
    median per event type — constant memory per group at any scale.

    The sketch estimates themselves are engine-specific, so the
    OUTPUT is made deterministic and driver-hashable: each row
    carries the exact answers plus in-bound booleans — ``hll_ok``
    (|approx - exact| <= 3*rsd*exact, ~unfailable for a working
    HLL++ at rsd=0.02) and ``tdigest_ok`` (the approximate median
    lies inside the exact p45..p55 band; percentile_approx at
    accuracy 10000 has rank error <= n/10000, far tighter). The
    oracle computes the exact values and TRUE literals, so a sketch
    drifting out of bound flips a boolean and fails the hash — the
    sketch check is driver-visible without hashing the unstable
    estimate. Exact countDistinct/percentile here exist only to
    judge the sketches; at 100 TB you would ship the sketch columns
    alone."""
    ev = load_table(spark, "events", sf_dir)
    # countDistinct BESIDE buffer aggregates (percentile sketches)
    # forces an Expand that doubles the scan through the aggregation
    # (measured 5x slower at sf0.1), so the exact distinct runs as
    # its own two-stage groupBy (partial-aggregated, no Expand) and
    # re-joins on the group-cardinality key
    exact_users = (ev.groupBy("event_type", "user_id")
                   .agg(F.count(F.lit(1)).alias("_c"))
                   .groupBy("event_type")
                   .agg(F.count(F.lit(1)).alias("exact_users")))
    agg = (ev.groupBy("event_type")
           .agg(F.approx_count_distinct("user_id", rsd=HLL_RSD)
                .alias("approx_users"),
                F.percentile_approx("value", 0.5, 10000)
                .alias("approx_p50"),
                # one exact-percentile buffer per group, not three
                F.expr("percentile(value, array(0.45, 0.5, 0.55))")
                .alias("pct"),
                F.count(F.lit(1)).alias("n"))
           .join(exact_users, "event_type"))
    return (agg.select(
        "event_type", "n", "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users"))
         <= F.col("exact_users") * (3 * HLL_RSD)).alias("hll_ok"),
        F.round(F.col("pct")[1], 4).alias("exact_p50"),
        ((F.col("approx_p50") >= F.col("pct")[0])
         & (F.col("approx_p50") <= F.col("pct")[2])).alias("tdigest_ok"))
        .orderBy("event_type"))


APPROX_SKETCHES_ORACLE = """
SELECT event_type, count(*) AS n,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_ok,
       round(quantile_cont(value, 0.5), 4) AS exact_p50,
       TRUE AS tdigest_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
    "approx_sketches": approx_sketches,
}

ORACLES = {
    "skew_salted_agg": SKEW_AGG_ORACLE,
    "skew_salted_join": SKEW_JOIN_ORACLE,
    "approx_sketches": APPROX_SKETCHES_ORACLE,
}
