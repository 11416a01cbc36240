"""ES-DSL pipeline aggregations: second-pass computations over the
bucket frame (derivative, cumulative_sum, moving average,
bucket_script/bucket_selector, bucket_sort, and sibling *_bucket
reductions).

Generalizes the reference's aggregation usage (terms agg,
Bootstrap.java:196-219) to the pipeline-agg family of the ES DSL.
Scale posture: every pipeline op runs AFTER the grouped aggregate, on
bucket-cardinality rows (days/bins — bounded, not data-scale), as a
single-partition window. The corpus-sized work is the one shuffle the
parent aggregation already does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import search
from parquet_generator_spark.sources.catalog import load_table

_DAY_KEY = "strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')"


def dsl_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase revenue with day-over-day derivative and running
    cumulative sum — ES `derivative` + `cumulative_sum` pipeline aggs
    over a date_histogram parent."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "revenue": {"sum": {"field": "value"}},
                "rev_deriv": {"derivative": {"buckets_path": "revenue"}},
                "rev_cumsum": {"cumulative_sum":
                               {"buckets_path": "revenue"}},
            },
        }},
    })


DSL_DERIVATIVE_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key,
         count(*) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT key, doc_count, revenue,
       round(revenue - lag(revenue) OVER (ORDER BY key), 4) AS rev_deriv,
       round(sum(revenue) OVER (ORDER BY key
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS rev_cumsum
FROM b ORDER BY key
"""


def dsl_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of daily event volume — ES
    `moving_fn` pipeline agg (trailing window including the current
    bucket)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "click"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "vol_ma7": {"moving_fn": {"buckets_path": "doc_count",
                                          "window": 7}},
            },
        }},
    })


DSL_MOVING_AVG_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key, count(*) AS doc_count
  FROM events WHERE event_type = 'click'
  GROUP BY key)
SELECT key, doc_count,
       round(avg(doc_count) OVER (ORDER BY key
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS vol_ma7
FROM b ORDER BY key
"""


BUSY_DAY_MIN_DOCS = 8


def dsl_bucket_script_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day average order value via `bucket_script` (revenue /
    doc_count), keeping only busy days via `bucket_selector` — the ES
    spelling of a HAVING clause over derived bucket metrics."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "revenue": {"sum": {"field": "value"}},
                "aov": {"bucket_script":
                        {"expr": "revenue / doc_count"}},
                "busy": {"bucket_selector":
                         {"expr": f"doc_count >= {BUSY_DAY_MIN_DOCS}"}},
            },
        }},
    })


DSL_BUCKET_SCRIPT_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key,
         count(*) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT key, doc_count, revenue,
       round(revenue / doc_count, 4) AS aov
FROM b WHERE doc_count >= {BUSY_DAY_MIN_DOCS}
ORDER BY key
"""


TOP_DAYS = 5


def dsl_bucket_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top revenue days: `bucket_sort` pipeline agg re-orders and
    truncates the bucket frame (ORDER BY metric LIMIT n after the
    aggregate)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "revenue": {"sum": {"field": "value"}},
                "top": {"bucket_sort": {
                    "sort": [{"revenue": {"order": "desc"}}],
                    "size": TOP_DAYS}},
            },
        }},
    })


DSL_BUCKET_SORT_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key,
         count(*) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT key, doc_count, revenue
FROM b ORDER BY revenue DESC, key LIMIT {TOP_DAYS}
"""


def dsl_avg_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sibling pipeline aggs: reduce the per-day revenue series to
    scalars (mean / peak daily revenue) — `avg_bucket` / `max_bucket`
    beside the date_histogram, aggregating its bucket frame."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"revenue": {"sum": {"field": "value"}}},
            },
            "mean_daily_rev": {"avg_bucket":
                               {"buckets_path": "per_day>revenue"}},
            "peak_daily_rev": {"max_bucket":
                               {"buckets_path": "per_day>revenue"}},
            "low_daily_rev": {"min_bucket":
                              {"buckets_path": "per_day>revenue"}},
            "total_rev": {"sum_bucket":
                          {"buckets_path": "per_day>revenue"}},
        },
    })


DSL_AVG_BUCKET_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key, round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT round(avg(revenue), 4) AS mean_daily_rev,
       max(revenue) AS peak_daily_rev,
       min(revenue) AS low_daily_rev,
       round(sum(revenue), 4) AS total_rev
FROM b
"""


def dsl_date_histogram_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_histogram with ``min_doc_count: 0`` — ES emits EMPTY
    calendar buckets (doc_count 0, null metrics) for gaps in the data.
    The calendar axis derives from the data min/max (one scalar agg)
    and broadcast-left-joins the real buckets."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"bool": {"must": [
            {"term": {"event_type": "purchase"}},
            {"range": {"value": {"gt": 150}}},
        ]}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0},
            "aggs": {"revenue": {"sum": {"field": "value"}}},
        }},
    })


DSL_ZEROFILL_ORACLE = f"""
WITH f AS (SELECT * FROM events
           WHERE event_type = 'purchase' AND value > 150),
b AS (
  SELECT {_DAY_KEY} AS key, count(*) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM f GROUP BY key),
axis AS (
  SELECT strftime(unnest(generate_series(
           date_trunc('day', min(ts)), date_trunc('day', max(ts)),
           INTERVAL 1 DAY)), '%Y-%m-%d %H:%M:%S') AS key
  FROM f)
SELECT axis.key, coalesce(b.doc_count, 0) AS doc_count, b.revenue
FROM axis LEFT JOIN b ON axis.key = b.key
ORDER BY axis.key
"""


HIST_INTERVAL = 50


def dsl_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric `histogram` bucket agg (fixed-width value bins) with a
    metric sub-agg — floor(value/interval)*interval becomes the group
    key, one shuffle on the bin."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"by_value": {
            "histogram": {"field": "value", "interval": HIST_INTERVAL},
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        }},
    })


DSL_HISTOGRAM_ORACLE = f"""
SELECT floor(value / {HIST_INTERVAL}) * {HIST_INTERVAL} AS key,
       count(*) AS doc_count, round(avg(value), 4) AS avg_value
FROM events WHERE event_type = 'purchase'
GROUP BY key ORDER BY key ASC
"""


def dsl_match_msm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`match` with `minimum_should_match: 2` (at least 2 of 3 query
    tokens present — a sum of codegen rlike tests) combined with a
    bool `should` requiring 2 of 3 heterogeneous clauses. Every leaf
    stays null-safe, so the k-of-m count is never NULL-poisoned."""
    docs = load_table(spark, "documents", sf_dir)
    from parquet_generator_spark.operators.esdsl import search
    return (search(docs, {
        "query": {"bool": {
            "must": [{"match": {"text": {
                "query": "spark window merge",
                "minimum_should_match": 2}}},
                {"match": {"text": {"query": "the data",
                                    "operator": "and"}}}],
            "should": [
                {"term": {"lang": "en"}},
                {"prefix": {"source": {"value": "src1"}}},
                {"range": {"n_chars": {"gte": 200}}},
            ],
            "minimum_should_match": 2,
        }},
    }).select("doc_id", "lang", "source", "n_chars").orderBy("doc_id"))


def _tok_re(t: str) -> str:
    return f"(^|[^a-z0-9]){t}([^a-z0-9]|$)"


DSL_MATCH_MSM_ORACLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (CAST(regexp_matches(lower(text), '{_tok_re("spark")}') AS INT)
       + CAST(regexp_matches(lower(text), '{_tok_re("window")}') AS INT)
       + CAST(regexp_matches(lower(text), '{_tok_re("merge")}') AS INT))
      >= 2
  AND regexp_matches(lower(text), '{_tok_re("the")}')
  AND regexp_matches(lower(text), '{_tok_re("data")}')
  AND (CAST((lang IS NOT NULL AND lang = 'en') AS INT)
       + CAST((source IS NOT NULL AND source LIKE 'src1%') AS INT)
       + CAST((n_chars IS NOT NULL AND n_chars >= 200) AS INT)) >= 2
ORDER BY doc_id
"""


def dsl_terms_order_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms buckets ordered by a sub-metric (ES `"order":
    {"avg_value": "desc"}`) instead of doc_count — the ordering is a
    sort of the post-agg bucket frame, not a second scan."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"by_type": {
            "terms": {"field": "event_type", "size": 3,
                      "order": {"avg_value": "desc"}},
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        }},
    })


DSL_TERMS_ORDER_ORACLE = """
SELECT event_type AS key, count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY key
ORDER BY avg_value DESC, key ASC
LIMIT 3
"""


def dsl_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`multi_match`: one analyzed query ORed across fields (here
    text and source) — N codegen rlike tests, no extra scan."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"multi_match": {"query": "src1 vector",
                                  "fields": ["text", "source"]}},
    }).select("doc_id", "source").orderBy("doc_id"))


DSL_MULTI_MATCH_ORACLE = """
SELECT doc_id, source FROM documents
WHERE (text IS NOT NULL AND
       regexp_matches(lower(text),
         '(^|[^a-z0-9])(src1|vector)([^a-z0-9]|$)'))
   OR (source IS NOT NULL AND
       regexp_matches(lower(source),
         '(^|[^a-z0-9])(src1|vector)([^a-z0-9]|$)'))
ORDER BY doc_id
"""


def dsl_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`fuzzy`: term-level edit-distance match ("purchse" finds
    purchase at AUTO fuzziness = 2 for a 7-char term; "viem" finds
    view at distance 1). levenshtein runs inside codegen — a narrow
    filter, no UDF, no extra scan."""
    ev = load_table(spark, "events", sf_dir)
    return (search(ev, {
        "query": {"bool": {"should": [
            {"fuzzy": {"event_type": {"value": "purchse"}}},
            {"fuzzy": {"event_type": {"value": "viem",
                                      "fuzziness": 1}}},
        ], "minimum_should_match": 1}},
    }).groupBy("event_type")
      .agg(F.count(F.lit(1)).alias("n"))
      .orderBy("event_type"))


DSL_FUZZY_ORACLE = """
SELECT event_type, count(*) AS n FROM events
WHERE (event_type IS NOT NULL
       AND levenshtein(event_type, 'purchse') <= 2)
   OR (event_type IS NOT NULL
       AND levenshtein(event_type, 'viem') <= 1)
GROUP BY event_type ORDER BY event_type
"""


def dsl_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`global` bucket agg: filtered metrics (purchase average) next
    to corpus-wide metrics in one response — two one-row aggregates
    cross-joined, each a single pass."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {
            "purch_avg": {"avg": {"field": "value"}},
            "all_docs": {"global": {},
                         "aggs": {"avg_value": {"avg":
                                                {"field": "value"}}}},
        },
    })


DSL_GLOBAL_ORACLE = """
SELECT (SELECT round(avg(value), 4) FROM events
        WHERE event_type = 'purchase') AS purch_avg,
       (SELECT count(*) FROM events) AS all_docs_doc_count,
       (SELECT round(avg(value), 4) FROM events) AS all_docs_avg_value
"""


def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation: extract a field from the JSON
    props column (the reference's lenient-decode target) and
    aggregate it per event type — the extraction is a JVM-side JSON
    path, no UDF, evaluated inside the single grouped pass."""
    ev = load_table(spark, "events", sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (ev.withColumn("k", k)
            .groupBy("event_type")
            .agg(F.round(F.avg("k"), 4).alias("avg_k"),
                 F.max("k").alias("max_k"),
                 F.count("k").alias("n_with_k"))
            .orderBy("event_type"))


JSON_PROPS_ORACLE = """
SELECT event_type,
       round(avg(k), 4) AS avg_k,
       max(k) AS max_k,
       count(k) AS n_with_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type
"""


def dsl_date_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`date_range` bucket agg: named calendar windows (from-incl /
    to-excl, possibly overlapping) with metric sub-aggs — the same
    map-side bucket explode as `range`/`filters`, one shuffle."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"periods": {
            "date_range": {"field": "ts", "ranges": [
                {"key": "wk1", "to": "2024-01-08"},
                {"key": "wk2", "from": "2024-01-08",
                 "to": "2024-01-15"},
                {"key": "rest", "from": "2024-01-15"},
            ]},
            "aggs": {"revenue": {"sum": {"field": "value"}}},
        }},
    })


DSL_DATE_RANGE_ORACLE = """
WITH f AS (SELECT * FROM events WHERE event_type = 'purchase'),
b AS (
  SELECT 'wk1' AS key, count(*) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM f WHERE ts < TIMESTAMP '2024-01-08'
  UNION ALL
  SELECT 'wk2', count(*), round(sum(value), 4)
  FROM f WHERE ts >= TIMESTAMP '2024-01-08'
    AND ts < TIMESTAMP '2024-01-15'
  UNION ALL
  SELECT 'rest', count(*), round(sum(value), 4)
  FROM f WHERE ts >= TIMESTAMP '2024-01-15')
SELECT key, doc_count, revenue FROM b
WHERE doc_count > 0 ORDER BY key
"""


def dsl_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`extended_stats` metric agg: stats plus sum-of-squares and
    POPULATION variance/std-deviation (ES's convention), all one
    grouped pass."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "view"}},
        "aggs": {"v": {"extended_stats": {"field": "value"}}},
    })


DSL_EXTENDED_STATS_ORACLE = """
SELECT count(value) AS count,
       round(min(value), 4) AS min,
       round(max(value), 4) AS max,
       round(avg(value), 4) AS avg,
       round(sum(value), 4) AS sum,
       round(sum(value * value), 4) AS sum_of_squares,
       round(var_pop(value), 4) AS variance,
       round(stddev_pop(value), 4) AS std_deviation
FROM events WHERE event_type = 'view'
"""


def dsl_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`percentile_ranks` metric agg: for each probe value, the
    percentage of observations at or below it (exact; the inverse of
    the percentiles agg)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "view"}},
        "aggs": {"vr": {"percentile_ranks": {"field": "value",
                                             "values": [50, 150, 300]}}},
    })


DSL_PERCENTILE_RANKS_ORACLE = """
SELECT round(100.0 * avg(CASE WHEN value <= 50 THEN 1.0 ELSE 0.0 END), 4)
         AS vr_p50,
       round(100.0 * avg(CASE WHEN value <= 150 THEN 1.0 ELSE 0.0 END), 4)
         AS vr_p150,
       round(100.0 * avg(CASE WHEN value <= 300 THEN 1.0 ELSE 0.0 END), 4)
         AS vr_p300
FROM events WHERE event_type = 'view'
"""


HIGH_VALUE = 300.0


def dsl_missing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`missing` bucket agg: docs lacking an (optional, derived)
    field, with metrics over that bucket — ES's null-bucket
    companion to `exists`."""
    ev = load_table(spark, "events", sf_dir)
    with_amount = ev.withColumn(
        "big_amount",
        F.when(F.col("value") > HIGH_VALUE, F.col("value")))
    return search(with_amount, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"no_big": {
            "missing": {"field": "big_amount"},
            "aggs": {"avg_small": {"avg": {"field": "value"}}},
        }},
    })


DSL_MISSING_ORACLE = f"""
SELECT count(*) AS doc_count,
       round(avg(value), 4) AS avg_small
FROM events
WHERE event_type = 'purchase' AND value <= {HIGH_VALUE}
"""


def dsl_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`function_score` + `field_value_factor`: rank long documents
    matching a range query by 1.5 * log1p(n_chars) — log1p is ES's
    COMMON logarithm modifier. Top-k via TakeOrderedAndProject (see
    function_score_search)."""
    from parquet_generator_spark.operators.esdsl import (
        function_score_search,
    )

    docs = load_table(spark, "documents", sf_dir)
    return function_score_search(docs, {
        "query": {"range": {"n_chars": {"gte": 200}}},
        "field_value_factor": {"field": "n_chars",
                               "modifier": "log1p", "factor": 1.5},
        "size": 15,
    })


DSL_FUNCTION_SCORE_ORACLE = """
WITH scored AS (
  SELECT doc_id, round(1.5 * log10(n_chars + 1.0), 4) AS score
  FROM documents WHERE n_chars >= 200),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored)
SELECT rank, doc_id, score FROM ranked WHERE rank <= 15
ORDER BY rank
"""


def dsl_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES field `collapse`: the single longest English document per
    source (top hit per collapse-field group, ordered by the search
    sort), overall top-10 sources by that length."""
    from parquet_generator_spark.operators.esdsl import collapse_search

    docs = load_table(spark, "documents", sf_dir)
    return collapse_search(docs, {
        "query": {"term": {"lang": "en"}},
        "collapse": {"field": "source"},
        "sort": [{"n_chars": "desc"}],
        "size": 10,
    })


DSL_COLLAPSE_ORACLE = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents WHERE lang = 'en')
SELECT source, doc_id, n_chars FROM ranked WHERE rn = 1
ORDER BY n_chars DESC, doc_id ASC
LIMIT 10
"""


QUERIES = {
    "dsl_function_score": dsl_function_score,
    "dsl_collapse": dsl_collapse,
    "dsl_missing_agg": dsl_missing_agg,
    "dsl_extended_stats": dsl_extended_stats,
    "dsl_percentile_ranks": dsl_percentile_ranks,
    "dsl_date_range_agg": dsl_date_range_agg,
    "dsl_global_agg": dsl_global_agg,
    "json_props_agg": json_props_agg,
    "dsl_multi_match": dsl_multi_match,
    "dsl_fuzzy": dsl_fuzzy,
    "dsl_derivative": dsl_derivative,
    "dsl_date_histogram_zerofill": dsl_date_histogram_zerofill,
    "dsl_histogram": dsl_histogram,
    "dsl_match_msm": dsl_match_msm,
    "dsl_terms_order_metric": dsl_terms_order_metric,
    "dsl_moving_avg": dsl_moving_avg,
    "dsl_bucket_script_selector": dsl_bucket_script_selector,
    "dsl_bucket_sort": dsl_bucket_sort,
    "dsl_avg_bucket": dsl_avg_bucket,
}

ORACLES = {
    "dsl_function_score": DSL_FUNCTION_SCORE_ORACLE,
    "dsl_collapse": DSL_COLLAPSE_ORACLE,
    "dsl_missing_agg": DSL_MISSING_ORACLE,
    "dsl_extended_stats": DSL_EXTENDED_STATS_ORACLE,
    "dsl_percentile_ranks": DSL_PERCENTILE_RANKS_ORACLE,
    "dsl_date_range_agg": DSL_DATE_RANGE_ORACLE,
    "dsl_global_agg": DSL_GLOBAL_ORACLE,
    "json_props_agg": JSON_PROPS_ORACLE,
    "dsl_multi_match": DSL_MULTI_MATCH_ORACLE,
    "dsl_fuzzy": DSL_FUZZY_ORACLE,
    "dsl_derivative": DSL_DERIVATIVE_ORACLE,
    "dsl_date_histogram_zerofill": DSL_ZEROFILL_ORACLE,
    "dsl_histogram": DSL_HISTOGRAM_ORACLE,
    "dsl_match_msm": DSL_MATCH_MSM_ORACLE,
    "dsl_terms_order_metric": DSL_TERMS_ORDER_ORACLE,
    "dsl_moving_avg": DSL_MOVING_AVG_ORACLE,
    "dsl_bucket_script_selector": DSL_BUCKET_SCRIPT_ORACLE,
    "dsl_bucket_sort": DSL_BUCKET_SORT_ORACLE,
    "dsl_avg_bucket": DSL_AVG_BUCKET_ORACLE,
}
