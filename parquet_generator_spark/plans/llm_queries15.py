"""LLM-pipeline wave 13: boilerplate detection, data-card length
histogram, and windowed trending types.

Scale posture: boilerplate grouping shuffles on the prefix hash
(map-side partial agg, group cardinality bounded by distinct
prefixes); the length histogram is pure log arithmetic + one grouped
pass; windowed top-k is a keyed window PARTITIONED by the day bucket
(parallel across days, never global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.text import toks_duck, toks_spark
from parquet_generator_spark.operators.util import widen_if_narrow
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------- boilerplate_prefix_groups

PREFIX_K = 6  # first K analyzed tokens define the boilerplate key
BOILERPLATE_MIN = 2


def boilerplate_prefix_groups(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Boilerplate/header detection: documents sharing their first
    PREFIX_K analyzed tokens (the shared-template signature scraped
    corpora exhibit — identical page headers, license banners, forum
    signatures). One md5 of the joined prefix -> groupBy on the hash;
    groups below BOILERPLATE_MIN members drop. Reports each group's
    size, the repeated prefix, and the member span (min/max doc_id)
    so a curation run can strip or keep-one."""
    docs = widen_if_narrow(load_table(spark, "documents", sf_dir))
    toks = toks_spark("text")
    pref = (docs.select(
        "doc_id",
        F.expr(f"array_join(slice({toks}, 1, {PREFIX_K}), ' ')")
        .alias("prefix"))
        .filter(F.expr(f"size({toks}) >= {PREFIX_K}")))
    return (pref.groupBy("prefix")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .filter(F.col("n_docs") >= BOILERPLATE_MIN)
            .orderBy(F.desc("n_docs"), F.asc("prefix")))


BOILERPLATE_PREFIX_ORACLE = f"""
WITH t AS (SELECT doc_id, {toks_duck('text')} AS tk FROM documents),
p AS (
  SELECT doc_id,
         list_aggr(tk[1 : {PREFIX_K}], 'string_agg', ' ') AS prefix
  FROM t WHERE len(tk) >= {PREFIX_K})
SELECT prefix, count(*) AS n_docs,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM p GROUP BY prefix
HAVING count(*) >= {BOILERPLATE_MIN}
ORDER BY n_docs DESC, prefix ASC
"""


# ------------------------------------------------ length_log_histogram

def length_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card length distribution: per-source histogram of doc
    lengths in power-of-2 character buckets (floor(log2(n_chars))) —
    the standard long-tail-friendly length chart. Pure per-row log
    arithmetic, one grouped pass."""
    docs = load_table(spark, "documents", sf_dir)
    bucket = F.floor(F.log2(F.col("n_chars").cast("double")))
    return (docs.filter(F.col("n_chars") > 0)
            .groupBy("source", bucket.cast("long").alias("log2_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"))
            .orderBy("source", "log2_bucket"))


LENGTH_LOG_HISTOGRAM_ORACLE = """
SELECT source,
       CAST(floor(log2(CAST(n_chars AS DOUBLE))) AS BIGINT)
         AS log2_bucket,
       count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
WHERE n_chars > 0
GROUP BY source, log2_bucket
ORDER BY source, log2_bucket
"""


# ------------------------------------------------- windowed_topk_types

WINDOWED_TOPK = 3


def windowed_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: top-3 types per DAY by event count —
    the dashboard query every event pipeline ships. One grouped pass
    to (day, type) counts, then a rank window PARTITIONED BY DAY
    (parallel across days; each day's frame is type-cardinality)."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy(F.to_date("ts").alias("day"),
                        F.col("event_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("day").orderBy(F.desc("n"),
                                          F.asc("event_type"))
    return (daily.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= WINDOWED_TOPK)
            .select("day", F.col("rk").cast("int").alias("rk"),
                    "event_type", "n")
            .orderBy("day", "rk"))


WINDOWED_TOPK_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT day, event_type, n,
         CAST(row_number() OVER (PARTITION BY day
                                 ORDER BY n DESC, event_type ASC)
              AS INT) AS rk
  FROM daily)
SELECT day, rk, event_type, n FROM ranked
WHERE rk <= {WINDOWED_TOPK}
ORDER BY day, rk
"""


QUERIES.update({
    "boilerplate_prefix_groups": boilerplate_prefix_groups,
    "length_log_histogram": length_log_histogram,
    "windowed_topk_types": windowed_topk_types,
})
ORACLES.update({
    "boilerplate_prefix_groups": BOILERPLATE_PREFIX_ORACLE,
    "length_log_histogram": LENGTH_LOG_HISTOGRAM_ORACLE,
    "windowed_topk_types": WINDOWED_TOPK_ORACLE,
})
