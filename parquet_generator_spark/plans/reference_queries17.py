"""ES aggregation surface, seventeenth wave: the ML-flavored
pipeline aggs `bucket_correlation` and `bucket_count_ks_test`
(both under `aggs/pipeline` in ES 8.x — the reference's alerting
domain uses them to score whether an indicator correlates with, or
distributionally shifts, the per-rule event counts that
Bootstrap.java:196-219's terms agg produces).

Both reduce a bounded terms-bucket frame (|event_type| keys) to ONE
row. The bucket frame comes from a single map-side-combined groupBy;
per-bucket metric sums use exact scaled-integer arithmetic (4-decimal
doubles * 1e4 as BIGINT) so cross-engine float-sum order can't drift
the inputs, and the final Pearson / KS statistic is one deterministic
double expression over those exact ints. The KS ECDF is computed with
an array fold over the sorted bucket list — no Window at all, so the
package-wide "no unpartitioned Window" invariant holds even for this
inherently ordered statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ----------------------------------------------- dsl_bucket_correlation

_PEARSON = ("(cast(n as double) * sxy - sx * sy) "
            "/ (sqrt(cast(n as double) * sxx - sx * sx) "
            "* sqrt(cast(n as double) * syy - sy * sy))")


def dsl_bucket_correlation(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """ES `bucket_correlation` pipeline agg (count_correlation
    function): Pearson correlation between the per-bucket doc_count
    of a terms agg on event_type and a per-bucket metric (sum of
    value). Buckets are exact (counts + scaled-int sums); the
    correlation is a single closed-form expression over the 6-ish
    bucket rows, evaluated identically in the oracle."""
    ev = load_table(spark, "events", sf_dir)
    buckets = (ev.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.expr(
                        "cast(round(value * 10000) as bigint)"))
                    .alias("sv")))
    stats = buckets.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("cast(cnt as double)")).alias("sx"),
        F.sum(F.expr("cast(sv as double)")).alias("sy"),
        F.sum(F.expr("cast(cnt as double) * cast(cnt as double)"))
        .alias("sxx"),
        F.sum(F.expr("cast(sv as double) * cast(sv as double)"))
        .alias("syy"),
        F.sum(F.expr("cast(cnt as double) * cast(sv as double)"))
        .alias("sxy"))
    return stats.select(
        F.col("n").alias("n_buckets"),
        F.expr(_PEARSON).alias("correlation"))


DSL_BUCKET_CORRELATION_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
           AS sv
  FROM events GROUP BY event_type),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(cnt AS DOUBLE)) AS sx,
         sum(CAST(sv AS DOUBLE)) AS sy,
         sum(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)) AS sxx,
         sum(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) AS syy,
         sum(CAST(cnt AS DOUBLE) * CAST(sv AS DOUBLE)) AS sxy
  FROM b)
SELECT n AS n_buckets, {_PEARSON} AS correlation FROM s
"""


# --------------------------------------------- dsl_bucket_count_ks_test

def dsl_bucket_count_ks_test(spark: SparkSession, sf_dir: str) \
        -> DataFrame:
    """ES `bucket_count_ks_test` pipeline agg, alternative
    "uniform": the Kolmogorov-Smirnov statistic between the
    empirical CDF of terms-bucket doc_counts (buckets in key order,
    ES's ks-test input convention) and the uniform CDF i/n. The
    ECDF is an array FOLD over the sorted bucket structs — cum
    count, bucket index, running max |ecdf - i/n| — so no Window
    touches the plan; one groupBy + one global 1-row aggregate."""
    ev = load_table(spark, "events", sf_dir)
    buckets = (ev.groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("cnt")))
    one = buckets.agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("event_type").alias("k"),
            F.col("cnt").alias("cnt")))).alias("bk"),
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n"))
    ks = F.expr(
        "aggregate(bk, "
        "struct(cast(0 as bigint) as cum, cast(0 as bigint) as i, "
        "cast(0.0 as double) as best), "
        "(acc, x) -> struct(acc.cum + x.cnt, acc.i + 1, "
        "greatest(acc.best, abs(cast(acc.cum + x.cnt as double) "
        "/ cast(total as double) "
        "- cast(acc.i + 1 as double) / cast(n as double)))), "
        "acc -> acc.best)")
    return one.select(
        F.col("n").alias("n_buckets"),
        F.col("total").alias("total_docs"),
        ks.alias("ks_stat"))


DSL_BUCKET_KS_ORACLE = """
WITH b AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY event_type),
e AS (
  SELECT cnt,
         sum(cnt) OVER (ORDER BY event_type
                        ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (ORDER BY event_type) AS i,
         sum(cnt) OVER () AS total,
         count(*) OVER () AS n
  FROM b)
SELECT CAST(max(n) AS BIGINT) AS n_buckets,
       CAST(max(total) AS BIGINT) AS total_docs,
       max(abs(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE)
               - CAST(i AS DOUBLE) / CAST(n AS DOUBLE))) AS ks_stat
FROM e
"""


QUERIES.update({"dsl_bucket_correlation": dsl_bucket_correlation,
                "dsl_bucket_count_ks_test": dsl_bucket_count_ks_test})
ORACLES.update({
    "dsl_bucket_correlation": DSL_BUCKET_CORRELATION_ORACLE,
    "dsl_bucket_count_ks_test": DSL_BUCKET_KS_ORACLE})
