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


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based scale path: HLL++ distinct users and t-digest
    median per event type — constant memory per group at any scale.
    Approximate by design (no SQL oracle; error bounds vs the exact
    answers are asserted in tests)."""
    ev = load_table(spark, "events", sf_dir)
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                 F.round(F.percentile_approx("value", 0.5, 10000), 4)
                 .alias("approx_p50"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("event_type"))


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
    "approx_sketches": approx_sketches,
}

ORACLES = {
    "skew_salted_agg": SKEW_AGG_ORACLE,
    "skew_salted_join": SKEW_JOIN_ORACLE,
    # approx_sketches: approximate by design — rows-only check
}
