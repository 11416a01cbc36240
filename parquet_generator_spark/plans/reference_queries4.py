"""ES-DSL aggregation surface, fourth tranche: weighted_avg /
top_metrics metrics, rare_terms / adjacency_matrix buckets, and the
serial_diff / stats_bucket / cumulative_cardinality pipeline family.

Generalizes the reference's aggregation usage (terms agg,
Bootstrap.java:196-219) to the remaining commonly-used ES agg kinds.
Scale posture: every new kind is one grouped pass over the filtered
scan (weighted_avg/top_metrics fold into the same aggregate;
rare_terms filters post-agg on key-cardinality rows; adjacency_matrix
is a constant-factor map-side explode; cumulative_cardinality is a
value-keyed shuffle plus a bucket-cardinality window — no per-bucket
distinct-set state, no second scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import search
from parquet_generator_spark.sources.catalog import load_table

_DAY_KEY = "strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')"


def dsl_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`weighted_avg` metric agg: quantity-weighted average unit price
    of returned lineitems — sum(v*w)/sum(w) in one grouped pass."""
    li = load_table(spark, "lineitem", sf_dir)
    return search(li, {
        "query": {"term": {"l_returnflag": "R"}},
        "aggs": {"wavg_price": {"weighted_avg": {
            "value": {"field": "l_extendedprice"},
            "weight": {"field": "l_quantity"},
        }}},
    })


DSL_WEIGHTED_AVG_ORACLE = """
SELECT round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
         AS wavg_price
FROM lineitem WHERE l_returnflag = 'R'
"""


def dsl_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`top_metrics` metric agg under a terms bucket: per event type,
    the value of the LATEST event — a single max_by aggregate folded
    into the terms groupBy (no per-bucket sort, no window). ES breaks
    ties arbitrarily; `tie_break` pins the unique event_id so both
    engines pick the same row."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "aggs": {"by_type": {
            "terms": {"field": "event_type", "size": 10},
            "aggs": {"last_value": {"top_metrics": {
                "metrics": {"field": "value"},
                "sort": {"ts": "desc"},
                "tie_break": "event_id",
            }}},
        }},
    })


DSL_TOP_METRICS_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
counts AS (
  SELECT event_type, count(*) AS doc_count FROM events GROUP BY 1)
SELECT c.event_type AS key, c.doc_count, r.value AS last_value
FROM counts c JOIN ranked r ON r.event_type = c.event_type AND r.rn = 1
ORDER BY c.doc_count DESC, key ASC LIMIT 10
"""


def dsl_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rare_terms` bucket agg: the long tail — (user, day) combos
    with exactly one purchase, ascending count order. One groupBy;
    the rarity filter runs post-agg on key-cardinality rows."""
    ev = load_table(spark, "events", sf_dir)
    ev = ev.withColumn(
        "user_day",
        F.concat_ws(":", F.col("user_id"), F.to_date("ts")))
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"rare": {
            "rare_terms": {"field": "user_day", "max_doc_count": 1},
            "aggs": {"spend": {"sum": {"field": "value"}}},
        }},
    })


DSL_RARE_TERMS_ORACLE = """
SELECT concat(user_id, ':', strftime(ts, '%Y-%m-%d')) AS key,
       count(*) AS doc_count,
       round(sum(value), 4) AS spend
FROM events WHERE event_type = 'purchase'
GROUP BY 1 HAVING count(*) <= 1
ORDER BY doc_count ASC, key ASC
"""


def dsl_serial_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`serial_diff` pipeline agg, lag=7: week-over-week delta of
    daily purchase revenue — a lag window over the (bounded) day
    frame, after the one corpus-scale grouped pass."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "revenue": {"sum": {"field": "value"}},
                "wow": {"serial_diff": {"buckets_path": "revenue",
                                        "lag": 7}},
            },
        }},
    })


DSL_SERIAL_DIFF_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key,
         count(*) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT key, doc_count, revenue,
       round(revenue - lag(revenue, 7) OVER (ORDER BY key), 4) AS wow
FROM b ORDER BY key
"""


def dsl_stats_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`stats_bucket` sibling pipeline agg: count/min/max/avg/sum of
    the per-day revenue metric across all buckets — one scalar agg of
    the day frame."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"revenue": {"sum": {"field": "value"}}},
            },
            "day_stats": {"stats_bucket":
                          {"buckets_path": "per_day>revenue"}},
        },
    })


DSL_STATS_BUCKET_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key, round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT count(revenue) AS day_stats_count,
       round(min(revenue), 4) AS day_stats_min,
       round(max(revenue), 4) AS day_stats_max,
       round(avg(revenue), 4) AS day_stats_avg,
       round(sum(revenue), 4) AS day_stats_sum
FROM b
"""


def dsl_cumulative_cardinality(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """`cumulative_cardinality` pipeline agg: distinct purchasers seen
    up to each day, EXACT, via the first-occurrence trick — each user
    counts only at their first day (one value-keyed shuffle), then a
    running sum over the bounded day frame. No per-bucket HLL unions,
    no second scan."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"users_seen": {"cumulative_cardinality":
                                    {"field": "user_id"}}},
        }},
    })


DSL_CUMULATIVE_CARDINALITY_ORACLE = f"""
WITH f AS (SELECT * FROM events WHERE event_type = 'purchase'),
b AS (
  SELECT {_DAY_KEY} AS key, count(*) AS doc_count
  FROM f GROUP BY key),
firsts AS (
  SELECT user_id, min({_DAY_KEY}) AS key FROM f GROUP BY user_id),
news AS (SELECT key, count(*) AS n FROM firsts GROUP BY key)
SELECT b.key, b.doc_count,
       CAST(sum(coalesce(n, 0)) OVER (ORDER BY b.key
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS users_seen
FROM b LEFT JOIN news ON b.key = news.key
ORDER BY b.key
"""


def dsl_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`adjacency_matrix` bucket agg: counts for each named filter and
    each pairwise intersection ("a&b") — constant-factor map-side
    explode, one shuffle, empty intersections omitted."""
    ev = load_table(spark, "events", sf_dir)
    ev = ev.withColumn("dow", F.dayofweek("ts"))  # 1=Sun .. 7=Sat
    return search(ev, {
        "aggs": {"adj": {
            "adjacency_matrix": {"filters": {
                "big": {"range": {"value": {"gte": 300}}},
                "purchase": {"term": {"event_type": "purchase"}},
                "weekend": {"terms": {"dow": [1, 7]}},
            }},
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        }},
    })


DSL_ADJACENCY_ORACLE = """
WITH e AS (
  SELECT value,
         value >= 300 AS big,
         event_type = 'purchase' AS purchase,
         dayofweek(ts) IN (0, 6) AS weekend
  FROM events),
b AS (
  SELECT 'big' AS key, count(*) AS doc_count,
         round(avg(value), 4) AS avg_value FROM e WHERE big
  UNION ALL
  SELECT 'big&purchase', count(*), round(avg(value), 4)
  FROM e WHERE big AND purchase
  UNION ALL
  SELECT 'big&weekend', count(*), round(avg(value), 4)
  FROM e WHERE big AND weekend
  UNION ALL
  SELECT 'purchase', count(*), round(avg(value), 4) FROM e WHERE purchase
  UNION ALL
  SELECT 'purchase&weekend', count(*), round(avg(value), 4)
  FROM e WHERE purchase AND weekend
  UNION ALL
  SELECT 'weekend', count(*), round(avg(value), 4) FROM e WHERE weekend)
SELECT key, doc_count, avg_value FROM b
WHERE doc_count > 0 ORDER BY key
"""


def dsl_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`multi_terms` bucket agg (ES 7.12+): buckets over (lang,
    source) value combinations with an avg metric — one multi-column
    groupBy shuffle, '|'-joined key_as_string, _count-desc order."""
    docs = load_table(spark, "documents", sf_dir)
    return search(docs, {
        "aggs": {"by_lang_src": {
            "multi_terms": {"terms": [{"field": "lang"},
                                      {"field": "source"}],
                            "size": 15},
            "aggs": {"avg_len": {"avg": {"field": "n_chars"}}},
        }},
    })


DSL_MULTI_TERMS_ORACLE = """
SELECT concat(lang, '|', source) AS key,
       count(*) AS doc_count,
       round(avg(n_chars), 4) AS avg_len
FROM documents GROUP BY lang, source
ORDER BY doc_count DESC, key ASC LIMIT 15
"""


AUTO_HIST_TARGET = 10


def dsl_auto_date_histogram(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """`auto_date_histogram`: the finest calendar interval keeping
    the bucket count <= 10 (the events table spans ~a month, so the
    choice lands on 'week' — non-trivially between day and month).
    The span arithmetic that picks the unit runs on a one-row scalar
    aggregate and is mirrored verbatim in the oracle SQL."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"auto": {
            "auto_date_histogram": {"field": "ts",
                                    "buckets": AUTO_HIST_TARGET},
            "aggs": {"revenue": {"sum": {"field": "value"}}},
        }},
    })


def _auto_hist_oracle(target: int) -> str:
    units = [("minute", 60), ("hour", 3600), ("day", 86400),
             ("week", 604800)]
    n_cols = ", ".join(
        f"CAST(epoch(date_trunc('{u}', hi)) - "
        f"epoch(date_trunc('{u}', lo)) AS BIGINT) // {s} + 1 AS n_{u}"
        for u, s in units)
    hist = "\n  UNION ALL ".join(
        f"SELECT '{u}' AS u, "
        f"strftime(date_trunc('{u}', ts), '%Y-%m-%d %H:%M:%S') AS key, "
        f"count(*) AS doc_count, round(sum(value), 4) AS revenue "
        f"FROM f GROUP BY 2"
        for u in ("minute", "hour", "day", "week", "month", "year"))
    return f"""
WITH f AS (SELECT * FROM events WHERE event_type = 'purchase'),
b AS (SELECT min(ts) AS lo, max(ts) AS hi FROM f),
n AS (SELECT {n_cols},
  (year(hi) * 12 + month(hi)) - (year(lo) * 12 + month(lo)) + 1
    AS n_month,
  year(hi) - year(lo) + 1 AS n_year FROM b),
sel AS (SELECT CASE
  WHEN n_minute <= {target} THEN 'minute'
  WHEN n_hour <= {target} THEN 'hour'
  WHEN n_day <= {target} THEN 'day'
  WHEN n_week <= {target} THEN 'week'
  WHEN n_month <= {target} THEN 'month'
  ELSE 'year' END AS unit FROM n),
h AS (
  {hist})
SELECT key, doc_count, revenue, u AS interval_unit
FROM h JOIN sel ON h.u = sel.unit ORDER BY key
"""


DSL_AUTO_DATE_HISTOGRAM_ORACLE = _auto_hist_oracle(AUTO_HIST_TARGET)


QUERIES = {
    "dsl_weighted_avg": dsl_weighted_avg,
    "dsl_top_metrics": dsl_top_metrics,
    "dsl_rare_terms": dsl_rare_terms,
    "dsl_serial_diff": dsl_serial_diff,
    "dsl_stats_bucket": dsl_stats_bucket,
    "dsl_cumulative_cardinality": dsl_cumulative_cardinality,
    "dsl_adjacency_matrix": dsl_adjacency_matrix,
    "dsl_multi_terms": dsl_multi_terms,
    "dsl_auto_date_histogram": dsl_auto_date_histogram,
}

ORACLES = {
    "dsl_weighted_avg": DSL_WEIGHTED_AVG_ORACLE,
    "dsl_top_metrics": DSL_TOP_METRICS_ORACLE,
    "dsl_rare_terms": DSL_RARE_TERMS_ORACLE,
    "dsl_serial_diff": DSL_SERIAL_DIFF_ORACLE,
    "dsl_stats_bucket": DSL_STATS_BUCKET_ORACLE,
    "dsl_cumulative_cardinality": DSL_CUMULATIVE_CARDINALITY_ORACLE,
    "dsl_adjacency_matrix": DSL_ADJACENCY_ORACLE,
    "dsl_multi_terms": DSL_MULTI_TERMS_ORACLE,
    "dsl_auto_date_histogram": DSL_AUTO_DATE_HISTOGRAM_ORACLE,
}
