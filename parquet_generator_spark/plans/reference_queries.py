"""Reference-parity and ES-DSL queries as (spark, sf_dir) callables,
each paired with its DuckDB oracle SQL.

These map SURVEY.md §2.1/§2.2 rows onto the test tables: the events
table plays the role of the reference's ES event indices
(`rule_name` -> `event_type`, dated indices -> the ts column),
documents plays an analyzed-text index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_generator_spark.operators import esdsl
from parquet_generator_spark.operators.esdsl import search
from parquet_generator_spark.sources.catalog import (
    load_events_between,
    load_table,
)


def terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's rule-discovery terms agg (Bootstrap.java:273)
    on event_type."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"rules": {"terms": {"field": "event_type", "size": 10}}},
    })


TERMS_AGG_ORACLE = """
SELECT event_type AS key, count(*) AS doc_count
FROM events GROUP BY event_type
ORDER BY doc_count DESC, key ASC
LIMIT 10
"""


def match_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase on analyzed text (EsParquetWriter.java:69)."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"match_phrase": {"text": {"query": "data query"}}},
    }).select("doc_id", "lang", "source").orderBy("doc_id"))


MATCH_PHRASE_ORACLE = r"""
SELECT doc_id, lang, source FROM documents
WHERE regexp_matches(lower(text),
                     '(^|[^a-z0-9])data[^a-z0-9]+query([^a-z0-9]|$)')
ORDER BY doc_id
"""


def date_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent-N-days selection (Bootstrap.java:264) as a pruned date
    scan: daily doc counts for the last 7 days of the stream. The
    range predicate is pushed onto the raw nanos column (see
    load_events_between) so row-group stats prune the scan."""
    ev = load_events_between(spark, sf_dir, "2024-01-24", "2024-01-31")
    return (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy("day"))


DATE_RANGE_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS doc_count
FROM events
WHERE ts >= TIMESTAMP '2024-01-24' AND ts < TIMESTAMP '2024-01-31'
GROUP BY day ORDER BY day
"""


def json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lenient JSON decode (ExtendedJsonDecoder parity) of the props
    column, then aggregate over the decoded field."""
    ev = load_table(spark, "events", sf_dir)
    rec = F.from_json(F.col("props"),
                      T.StructType([T.StructField("k", T.IntegerType())]))
    return (ev.withColumn("k", rec["k"])
            .groupBy((F.col("k") % 10).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("value"), 2).alias("avg_value"))
            .orderBy("bucket"))


JSON_DECODE_ORACLE = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS bucket,
       count(*) AS n,
       round(avg(value), 2) AS avg_value
FROM events GROUP BY bucket ORDER BY bucket
"""


def dsl_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (search(ev, {
        "query": {"bool": {
            "must": [{"term": {"event_type": "purchase"}}],
            "filter": [{"range": {"value": {"gte": 100.0}}}],
        }},
    }).select("event_id", "user_id", "value").orderBy("event_id"))


DSL_TERM_ORACLE = """
SELECT event_id, user_id, value FROM events
WHERE event_type = 'purchase' AND value >= 100.0
ORDER BY event_id
"""


def dsl_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return search(li, {
        "query": {"range": {"l_quantity": {"gte": 45.0}}},
        "aggs": {"flags": {"terms": {"field": "l_returnflag", "size": 10}}},
    })


DSL_RANGE_ORACLE = """
SELECT l_returnflag AS key, count(*) AS doc_count
FROM lineitem WHERE l_quantity >= 45.0
GROUP BY key ORDER BY doc_count DESC, key ASC
LIMIT 10
"""


def dsl_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool with must + must_not + standalone-should semantics."""
    ev = load_table(spark, "events", sf_dir)
    return (search(ev, {
        "query": {"bool": {
            "should": [{"term": {"event_type": "click"}},
                       {"term": {"event_type": "view"}}],
            "must_not": [{"range": {"value": {"lt": 50.0}}}],
        }},
    }).groupBy(F.col("event_type").alias("key"))
      .agg(F.count(F.lit(1)).alias("doc_count"))
      .orderBy("key"))


DSL_BOOL_ORACLE = """
SELECT event_type AS key, count(*) AS doc_count
FROM events
WHERE event_type IN ('click', 'view') AND NOT (value < 50.0)
GROUP BY key ORDER BY key
"""


def dsl_exists_prefix_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"bool": {"must": [
            {"prefix": {"source": {"value": "src1"}}},
            {"wildcard": {"lang": {"value": "e?"}}},
            {"regexp": {"source": {"value": "src1[0-9]?"}}},
            {"exists": {"field": "text"}},
        ]}},
    }).select("doc_id", "lang", "source").orderBy("doc_id"))


DSL_EPW_ORACLE = """
SELECT doc_id, lang, source FROM documents
WHERE source LIKE 'src1%'
  AND regexp_matches(lang, '^e.$')
  AND regexp_matches(source, '^(?:src1[0-9]?)$')
  AND text IS NOT NULL
ORDER BY doc_id
"""


def dsl_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"avg_value": {"avg": {"field": "value"}}},
        }},
    })


DSL_DATE_HISTOGRAM_ORACLE = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS key,
       count(*) AS doc_count,
       round(avg(value), 4) AS avg_value
FROM events WHERE event_type = 'purchase'
GROUP BY key ORDER BY key ASC
"""


def dsl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"match_all": {}},
        "aggs": {"value_stats": {"stats": {"field": "value"}}},
    })


DSL_STATS_ORACLE = """
SELECT count(value)          AS count,
       round(min(value), 4)  AS min,
       round(max(value), 4)  AS max,
       round(avg(value), 4)  AS avg,
       round(sum(value), 4)  AS sum
FROM events
"""


def dsl_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query + bucket agg + metric sub-aggs, the full reference shape
    (NewAggregationRequestGenerator usage in Bootstrap.java:204-212)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"bool": {
            "must": [{"term": {"event_type": "purchase"}}],
            "filter": [{"range": {"ts": {"gte": "2024-01-08"}}}],
        }},
        "aggs": {"by_user": {
            "terms": {"field": "user_id", "size": 5},
            "aggs": {"avg_value": {"avg": {"field": "value"}},
                     "sum_value": {"sum": {"field": "value"}}},
        }},
    })


DSL_COMPOSITE_ORACLE = """
SELECT user_id AS key, count(*) AS doc_count,
       round(avg(value), 4) AS avg_value,
       round(sum(value), 4) AS sum_value
FROM events
WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-08'
GROUP BY key ORDER BY doc_count DESC, key ASC
LIMIT 5
"""


QUERIES = {
    "terms_agg": terms_agg,
    "match_phrase_filter": match_phrase_filter,
    "date_range_scan": date_range_scan,
    "json_decode": json_decode,
    "dsl_term": dsl_term,
    "dsl_range": dsl_range,
    "dsl_bool": dsl_bool,
    "dsl_exists_prefix_wildcard": dsl_exists_prefix_wildcard,
    "dsl_date_histogram": dsl_date_histogram,
    "dsl_stats": dsl_stats,
    "dsl_composite": dsl_composite,
}

ORACLES = {
    "terms_agg": TERMS_AGG_ORACLE,
    "match_phrase_filter": MATCH_PHRASE_ORACLE,
    "date_range_scan": DATE_RANGE_ORACLE,
    "json_decode": JSON_DECODE_ORACLE,
    "dsl_term": DSL_TERM_ORACLE,
    "dsl_range": DSL_RANGE_ORACLE,
    "dsl_bool": DSL_BOOL_ORACLE,
    "dsl_exists_prefix_wildcard": DSL_EPW_ORACLE,
    "dsl_date_histogram": DSL_DATE_HISTOGRAM_ORACLE,
    "dsl_stats": DSL_STATS_ORACLE,
    "dsl_composite": DSL_COMPOSITE_ORACLE,
}
