"""ES-DSL twelfth tranche: the modern ranking-function queries —
`rank_feature` (saturation / log / sigmoid feature scoring),
`script_score` (arbitrary expression scoring, the painless-script
workhorse — here a SQL expression, the dsl_runtime_field precedent),
and `distance_feature` (freshness boost: score decays with distance
from a pivot date).

Scale posture: all three are pure per-row arithmetic projections
feeding a TakeOrderedAndProject top-k — no join, no shuffle beyond
the top-k reduction, pushdown untouched. The exact formulas below
are the ES-documented ones, reproduced bit-for-bit in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import translate_query
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ---------------------------------------------------- dsl_rank_feature

SAT_PIVOT = 300.0   # saturation pivot for n_chars
RANK_K = 15


def dsl_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rank_feature` with the `saturation` function over n_chars:
    score = x / (x + pivot) (the ES formula) — longer docs rank
    higher with diminishing returns. Scores rounded to 6 so both
    engines hash equal; top-k via TakeOrderedAndProject."""
    docs = load_table(spark, "documents", sf_dir)
    x = F.col("n_chars").cast("double")
    score = F.round(x / (x + F.lit(SAT_PIVOT)), 6)
    top = (docs.select("doc_id", score.alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(RANK_K))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "score").orderBy("rank"))


DSL_RANK_FEATURE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         round(CAST(n_chars AS DOUBLE)
               / (CAST(n_chars AS DOUBLE) + {SAT_PIVOT}), 6) AS score
  FROM documents)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
         AS rank,
       doc_id, score
FROM scored ORDER BY score DESC, doc_id
LIMIT {RANK_K}
"""


# ---------------------------------------------------- dsl_script_score

SCRIPT_K = 15


def dsl_script_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`script_score`: docs matching the inner query ranked by an
    arbitrary script — here the classic value-per-character composite
    `log(1 + value) * sqrt(user_id % 100)` as a SQL expression (the
    engine's painless stand-in, same as dsl_runtime_field). One
    projection + TakeOrderedAndProject."""
    ev = load_table(spark, "events", sf_dir)
    matched = ev.filter(translate_query(
        {"term": {"event_type": "purchase"}}))
    score = F.round(
        F.log(F.lit(1.0) + F.col("value"))
        * F.sqrt((F.col("user_id") % 100).cast("double")), 4)
    top = (matched.select("event_id", score.alias("score"))
           .orderBy(F.desc("score"), F.asc("event_id"))
           .limit(SCRIPT_K))
    w = Window.orderBy(F.desc("score"), F.asc("event_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "event_id", "score").orderBy("rank"))


DSL_SCRIPT_SCORE_ORACLE = f"""
WITH scored AS (
  SELECT event_id,
         round(ln(1.0 + value)
               * sqrt(CAST(user_id % 100 AS DOUBLE)), 4) AS score
  FROM events
  WHERE event_type = 'purchase')
SELECT CAST(row_number() OVER (ORDER BY score DESC, event_id) AS INT)
         AS rank,
       event_id, score
FROM scored ORDER BY score DESC, event_id
LIMIT {SCRIPT_K}
"""


# ------------------------------------------------ dsl_distance_feature

PIVOT_DATE = "2024-01-15"
PIVOT_DAYS = 7.0
DIST_K = 15


def dsl_distance_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`distance_feature` on a date field: freshness boost
    score = pivot / (pivot + |origin - ts|) (the ES formula, pivot
    expressed in days; distances computed on whole epoch MICROSECONDS
    so both engines divide identical integers). Matching docs come from
    the inner query; top-k via TakeOrderedAndProject."""
    ev = load_table(spark, "events", sf_dir)
    matched = ev.filter(translate_query(
        {"term": {"event_type": "view"}}))
    dist_days = (F.abs(
        F.unix_micros(F.col("ts"))
        - F.unix_micros(F.lit(PIVOT_DATE).cast("timestamp")))
        .cast("double") / 86400.0e6)
    score = F.round(F.lit(PIVOT_DAYS) / (F.lit(PIVOT_DAYS) + dist_days),
                    6)
    top = (matched.select("event_id", score.alias("score"))
           .orderBy(F.desc("score"), F.asc("event_id"))
           .limit(DIST_K))
    w = Window.orderBy(F.desc("score"), F.asc("event_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "event_id", "score").orderBy("rank"))


DSL_DISTANCE_FEATURE_ORACLE = f"""
WITH scored AS (
  SELECT event_id,
         round({PIVOT_DAYS}
               / ({PIVOT_DAYS}
                  + CAST(abs(epoch_us(ts)
                             - epoch_us(TIMESTAMP
                                        '{PIVOT_DATE} 00:00:00'))
                         AS DOUBLE) / 86400.0e6), 6) AS score
  FROM events
  WHERE event_type = 'view')
SELECT CAST(row_number() OVER (ORDER BY score DESC, event_id) AS INT)
         AS rank,
       event_id, score
FROM scored ORDER BY score DESC, event_id
LIMIT {DIST_K}
"""


QUERIES.update({
    "dsl_rank_feature": dsl_rank_feature,
    "dsl_script_score": dsl_script_score,
    "dsl_distance_feature": dsl_distance_feature,
})
ORACLES.update({
    "dsl_rank_feature": DSL_RANK_FEATURE_ORACLE,
    "dsl_script_score": DSL_SCRIPT_SCORE_ORACLE,
    "dsl_distance_feature": DSL_DISTANCE_FEATURE_ORACLE,
})
