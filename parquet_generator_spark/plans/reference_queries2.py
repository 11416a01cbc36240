"""Second wave of ES-DSL surface queries: nested bool trees, sibling
metric aggregations, filter/filters/range bucket aggs, percentiles,
and top_hits — the full shape of search bodies the reference's
interactive loop could issue beyond its own match_phrase + terms agg
(Bootstrap.java:196-219, EsParquetWriter.java:69).

All translate to single-pass declarative plans: sibling metrics are
one aggregate, overlapping buckets explode map-side (one shuffle),
top_hits is a broadcast bucket join + one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_generator_spark.operators.esdsl import search
from parquet_generator_spark.sources.catalog import load_table


def dsl_nested_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool nested inside bool: (src1* OR src2*) AND n_chars>=200
    AND NOT lang=de — the translator recurses, Catalyst flattens to
    one predicate at the scan."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"bool": {
            "must": [
                {"bool": {"should": [
                    {"prefix": {"source": {"value": "src1"}}},
                    {"prefix": {"source": {"value": "src2"}}},
                ]}},
                {"range": {"n_chars": {"gte": 200}}},
            ],
            "must_not": [{"term": {"lang": "de"}}],
        }},
    }).select("doc_id", "lang", "source", "n_chars").orderBy("doc_id"))


DSL_NESTED_BOOL_ORACLE = """
SELECT doc_id, lang, source, n_chars FROM documents
WHERE (source LIKE 'src1%' OR source LIKE 'src2%')
  AND n_chars >= 200
  AND NOT lang = 'de'
ORDER BY doc_id
"""


def dsl_multi_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several sibling metric aggs in one body -> one aggregate pass,
    one output row."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {
            "max_value": {"max": {"field": "value"}},
            "total_value": {"sum": {"field": "value"}},
            "n_users": {"cardinality": {"field": "user_id"}},
            "n_events": {"value_count": {"field": "event_id"}},
        },
    })


DSL_MULTI_METRIC_ORACLE = """
SELECT max(value) AS max_value,
       round(sum(value), 4) AS total_value,
       count(DISTINCT user_id) AS n_users,
       count(event_id) AS n_events
FROM events WHERE event_type = 'purchase'
"""


def dsl_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter bucket agg: sub-metrics over the docs matching the
    bucket query, composed with the search-level query."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"big_purchases": {
            "filter": {"range": {"value": {"gte": 100.0}}},
            "aggs": {"avg_value": {"avg": {"field": "value"}},
                     "n_users": {"cardinality": {"field": "user_id"}}},
        }},
    })


DSL_FILTER_AGG_ORACLE = """
SELECT count(*) AS doc_count,
       round(avg(value), 4) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events WHERE event_type = 'purchase' AND value >= 100.0
"""


def dsl_filters_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters agg: named buckets from arbitrary (possibly
    overlapping) queries; each with metric sub-aggs."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"tiers": {
            "filters": {"filters": {
                "low": {"range": {"value": {"lt": 50.0}}},
                "mid": {"range": {"value": {"gte": 50.0, "lt": 150.0}}},
                "high": {"range": {"value": {"gte": 150.0}}},
            }},
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        }},
    })


DSL_FILTERS_BUCKETS_ORACLE = """
SELECT CASE WHEN value < 50.0 THEN 'low'
            WHEN value < 150.0 THEN 'mid' ELSE 'high' END AS key,
       count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM events GROUP BY key ORDER BY key
"""


def dsl_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """range bucket agg (from inclusive, to exclusive) with a
    cardinality sub-agg per bucket."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"value_ranges": {
            "range": {"field": "value",
                      "ranges": [{"key": "low", "to": 50.0},
                                 {"key": "mid", "from": 50.0, "to": 150.0},
                                 {"key": "high", "from": 150.0}]},
            "aggs": {"n_users": {"cardinality": {"field": "user_id"}}},
        }},
    })


DSL_RANGE_AGG_ORACLE = """
SELECT CASE WHEN value < 50.0 THEN 'low'
            WHEN value < 150.0 THEN 'mid' ELSE 'high' END AS key,
       count(*) AS doc_count,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY key ORDER BY key
"""


def dsl_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentiles metric agg (exact interpolated; {"approx": true}
    swaps in percentile_approx for the scale path)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "view"}},
        "aggs": {"latency": {
            "percentiles": {"field": "value", "percents": [50, 90, 99]},
        }},
    })


DSL_PERCENTILES_ORACLE = """
SELECT round(quantile_cont(value, 0.5), 4)  AS latency_p50,
       round(quantile_cont(value, 0.9), 4)  AS latency_p90,
       round(quantile_cont(value, 0.99), 4) AS latency_p99
FROM events WHERE event_type = 'view'
"""


def dsl_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms buckets + top_hits: the 3 most recent events per
    event_type (sort totalized by the unique event_id)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"by_type": {
            "terms": {"field": "event_type", "size": 10},
            "aggs": {"latest": {"top_hits": {
                "size": 3,
                "sort": [{"ts": "desc"}, {"event_id": "asc"}],
                "_source": ["event_id", "user_id", "value"],
            }}},
        }},
    })


DSL_TOP_HITS_ORACLE = """
WITH b AS (
  SELECT event_type AS key, count(*) AS doc_count
  FROM events GROUP BY key
  ORDER BY doc_count DESC, key ASC LIMIT 10),
h AS (
  SELECT event_type AS key, event_id, user_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id ASC) AS hit_rank
  FROM events)
SELECT b.key AS key, b.doc_count, h.hit_rank, h.event_id, h.user_id,
       h.value
FROM b JOIN h ON b.key = h.key
WHERE h.hit_rank <= 3
ORDER BY b.key, h.hit_rank
"""


def dsl_terms_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms-in-terms: top event types, and the top-3 users inside
    each — two bucket levels from one grouped pass."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"by_type": {
            "terms": {"field": "event_type", "size": 10},
            "aggs": {"by_user": {"terms": {"field": "user_id",
                                           "size": 3}}},
        }},
    })


DSL_TERMS_NESTED_ORACLE = """
WITH pairs AS (
  SELECT event_type AS key, user_id AS sub_key,
         count(*) AS sub_doc_count
  FROM events GROUP BY key, sub_key),
outer_b AS (
  SELECT key, CAST(sum(sub_doc_count) AS BIGINT) AS doc_count
  FROM pairs GROUP BY key
  ORDER BY doc_count DESC, key ASC LIMIT 10),
ranked AS (
  SELECT p.key, o.doc_count, p.sub_key, p.sub_doc_count,
         row_number() OVER (PARTITION BY p.key
                            ORDER BY p.sub_doc_count DESC,
                                     p.sub_key ASC) AS sub_rank
  FROM pairs p JOIN outer_b o ON p.key = o.key)
SELECT key, doc_count, sub_key, sub_doc_count, sub_rank
FROM ranked WHERE sub_rank <= 3
ORDER BY doc_count DESC, key ASC, sub_rank
"""


def dsl_composite_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """composite agg with keyset pagination: page 2 (after a cursor)
    of (event_type, user_id) buckets in key order with an avg
    sub-metric — the ES scale-path aggregation, which is exactly a
    keyed groupBy plus a lexicographic keyset predicate."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"pages": {
            "composite": {
                "size": 8,
                "sources": [{"etype": {"terms": {"field": "event_type"}}},
                            {"uid": {"terms": {"field": "user_id"}}}],
                "after": {"etype": "click", "uid": 5},
            },
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        }},
    })


DSL_COMPOSITE_PAGED_ORACLE = """
SELECT event_type AS etype, user_id AS uid, count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY etype, uid
HAVING etype > 'click' OR (etype = 'click' AND uid > 5)
ORDER BY etype ASC, uid ASC
LIMIT 8
"""


def dsl_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms: event types over-represented among
    high-value events vs the whole stream — foreground and background
    counts from ONE conditional-aggregate scan, scored by rate
    lift."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"range": {"value": {"gte": 150.0}}},
        "aggs": {"hot_types": {
            "significant_terms": {"field": "event_type", "size": 10},
        }},
    })


DSL_SIGNIFICANT_TERMS_ORACLE = """
WITH per_key AS (
  SELECT event_type AS key,
         count(*) FILTER (WHERE value >= 150.0) AS doc_count,
         count(*) AS bg_count
  FROM events GROUP BY key),
t AS (SELECT sum(doc_count) AS fg_total, sum(bg_count) AS bg_total
      FROM per_key)
SELECT key, doc_count, bg_count,
       round((doc_count * 1.0 / fg_total)
             / (bg_count * 1.0 / bg_total), 4) AS score
FROM per_key, t WHERE doc_count > 0
ORDER BY score DESC, key ASC LIMIT 10
"""


QUERIES = {
    "dsl_nested_bool": dsl_nested_bool,
    "dsl_terms_nested": dsl_terms_nested,
    "dsl_composite_paged": dsl_composite_paged,
    "dsl_significant_terms": dsl_significant_terms,
    "dsl_multi_metric": dsl_multi_metric,
    "dsl_filter_agg": dsl_filter_agg,
    "dsl_filters_buckets": dsl_filters_buckets,
    "dsl_range_agg": dsl_range_agg,
    "dsl_percentiles": dsl_percentiles,
    "dsl_top_hits": dsl_top_hits,
}

ORACLES = {
    "dsl_nested_bool": DSL_NESTED_BOOL_ORACLE,
    "dsl_terms_nested": DSL_TERMS_NESTED_ORACLE,
    "dsl_composite_paged": DSL_COMPOSITE_PAGED_ORACLE,
    "dsl_significant_terms": DSL_SIGNIFICANT_TERMS_ORACLE,
    "dsl_multi_metric": DSL_MULTI_METRIC_ORACLE,
    "dsl_filter_agg": DSL_FILTER_AGG_ORACLE,
    "dsl_filters_buckets": DSL_FILTERS_BUCKETS_ORACLE,
    "dsl_range_agg": DSL_RANGE_AGG_ORACLE,
    "dsl_percentiles": DSL_PERCENTILES_ORACLE,
    "dsl_top_hits": DSL_TOP_HITS_ORACLE,
}
