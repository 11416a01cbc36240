"""ES-DSL search-surface features beyond aggregations: runtime
fields (search-time computed columns, ES 7.11+) and sorted-hits
keyset pagination (`sort` + `search_after`).

Scale posture: runtime fields are plain projections (no
materialization, pushdown unaffected for on-disk columns);
search_after pagination filters with a lexicographic keyset
predicate and sorts via TakeOrderedAndProject — per-partition top-k
with a k x P driver merge, never a global sort, which is exactly why
ES recommends search_after over from/size deep paging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import search
from parquet_generator_spark.sources.catalog import load_table


def dsl_runtime_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`runtime_mappings`: an am/pm bucket computed at search time,
    then used as a terms-agg field — the Kibana "runtime field"
    workflow. The definition is a SQL expression (documented
    deviation from painless)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "runtime_mappings": {"half_day": {
            "expr": "CASE WHEN hour(ts) < 12 THEN 'am' ELSE 'pm' END"}},
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"by_half": {
            "terms": {"field": "half_day", "size": 10},
            "aggs": {"revenue": {"sum": {"field": "value"}}},
        }},
    })


DSL_RUNTIME_FIELD_ORACLE = """
SELECT CASE WHEN hour(ts) < 12 THEN 'am' ELSE 'pm' END AS key,
       count(*) AS doc_count,
       round(sum(value), 4) AS revenue
FROM events WHERE event_type = 'purchase'
GROUP BY key ORDER BY doc_count DESC, key ASC LIMIT 10
"""


SA_VALUE = 400.0
SA_ID = 5000


def dsl_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted hits with a `search_after` keyset cursor: page 2 of
    purchases ordered by (value desc, event_id asc) after the cursor
    (400.0, 5000). The cursor becomes a lexicographic predicate and
    the sort+size a TakeOrderedAndProject."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "sort": [{"value": "desc"}, {"event_id": "asc"}],
        "search_after": [SA_VALUE, SA_ID],
        "size": 10,
    })


DSL_SEARCH_AFTER_ORACLE = f"""
SELECT event_id, ts, user_id, event_type, value, props
FROM events
WHERE event_type = 'purchase'
  AND (value < {SA_VALUE}
       OR (value = {SA_VALUE} AND event_id > {SA_ID}))
ORDER BY value DESC, event_id ASC LIMIT 10
"""


QUERIES = {
    "dsl_runtime_field": dsl_runtime_field,
    "dsl_search_after": dsl_search_after,
}

ORACLES = {
    "dsl_runtime_field": DSL_RUNTIME_FIELD_ORACLE,
    "dsl_search_after": DSL_SEARCH_AFTER_ORACLE,
}


def dsl_terms_include(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terms agg with `include`/`exclude` whole-key regexes (the ES
    partition-of-keys workflow): sources matching src1x but not
    src12 — both filters run post-agg on key-cardinality rows."""
    docs = load_table(spark, "documents", sf_dir)
    return search(docs, {
        "aggs": {"srcs": {"terms": {
            "field": "source", "size": 20,
            "include": "src1[0-9]", "exclude": "src12",
        }}},
    })


DSL_TERMS_INCLUDE_ORACLE = """
SELECT source AS key, count(*) AS doc_count
FROM documents
WHERE regexp_full_match(source, 'src1[0-9]')
  AND NOT regexp_full_match(source, 'src12')
GROUP BY source ORDER BY doc_count DESC, key ASC LIMIT 20
"""

QUERIES["dsl_terms_include"] = dsl_terms_include
ORACLES["dsl_terms_include"] = DSL_TERMS_INCLUDE_ORACLE


def dsl_significant_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`significant_text`: tokens over-represented in English docs vs
    the whole corpus — document-frequency lift over the text field's
    distinct analyzed tokens (one explode + one token shuffle)."""
    docs = load_table(spark, "documents", sf_dir)
    return search(docs, {
        "query": {"term": {"lang": "en"}},
        "aggs": {"sig": {"significant_text": {"field": "text",
                                              "size": 10}}},
    })


def _sig_text_oracle() -> str:
    from parquet_generator_spark.operators.text import toks_duck
    return f"""
WITH tok AS (
  SELECT lang = 'en' AS fg,
         unnest(list_distinct({toks_duck('text')})) AS key
  FROM documents),
per_key AS (
  SELECT key, count(*) FILTER (fg) AS doc_count,
         count(*) AS bg_count
  FROM tok GROUP BY key),
t AS (SELECT sum(doc_count) AS fg_total, sum(bg_count) AS bg_total
      FROM per_key)
SELECT key, doc_count, bg_count,
       round((doc_count / CAST(fg_total AS DOUBLE))
             / (bg_count / CAST(bg_total AS DOUBLE)), 4) AS score
FROM per_key, t WHERE doc_count > 0
ORDER BY score DESC, key ASC LIMIT 10
"""


DSL_SIGNIFICANT_TEXT_ORACLE = _sig_text_oracle()

QUERIES["dsl_significant_text"] = dsl_significant_text
ORACLES["dsl_significant_text"] = DSL_SIGNIFICANT_TEXT_ORACLE


MLT_QUERY_DOC = 0
MLT_MAX_TERMS = 25
MLT_MIN_DOC_FREQ = 2
MLT_K = 10


def dsl_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`more_like_this`: documents most similar to doc 0. Follows
    ES's two-phase shape — pick the query doc's representative terms
    (top max_query_terms by idf, min_doc_freq floor), then score all
    docs by the summed idf of shared DISTINCT terms. Deviation from
    ES: idf-sum scoring instead of full BM25 (deterministic,
    oracle-exact; tfidf/bm25 live in their own queries). The term
    set is bounded (25) so the scoring join broadcasts; everything
    else is two keyed shuffles (doc tokens, term df)."""
    from parquet_generator_spark.operators.text import toks_spark
    from parquet_generator_spark.operators.util import (
        broadcast_scalars,
        widen_if_narrow,
    )
    docs = widen_if_narrow(load_table(spark, "documents", sf_dir))
    tok = (docs.select("doc_id",
                       F.explode(F.expr(
                           f"array_distinct({toks_spark('text')})"))
                       .alias("w")))
    df_ = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    widf = broadcast_scalars(df_, n_docs).select(
        "w", "df",
        F.round(F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 6)
        .alias("idf"))
    qterms = (tok.filter(F.col("doc_id") == MLT_QUERY_DOC)
              .join(widf, "w")
              .filter(F.col("df") >= MLT_MIN_DOC_FREQ)
              .orderBy(F.desc("idf"), F.asc("w"))
              .limit(MLT_MAX_TERMS)
              .select("w", "idf"))
    return (tok.filter(F.col("doc_id") != MLT_QUERY_DOC)
            .join(F.broadcast(qterms), "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared"),
                 F.round(F.sum("idf"), 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(MLT_K))


def _mlt_oracle() -> str:
    from parquet_generator_spark.operators.text import toks_duck
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({toks_duck('text')})) AS w
  FROM documents),
df AS (SELECT w, count(*) AS df FROM tok GROUP BY w),
n AS (SELECT count(*) AS n FROM documents),
widf AS (
  SELECT w, df, round(ln((n + 1.0) / (df + 1.0)), 6) AS idf
  FROM df, n),
qterms AS (
  SELECT t.w, widf.idf
  FROM tok t JOIN widf ON widf.w = t.w
  WHERE t.doc_id = {MLT_QUERY_DOC} AND widf.df >= {MLT_MIN_DOC_FREQ}
  ORDER BY widf.idf DESC, t.w ASC LIMIT {MLT_MAX_TERMS})
SELECT t.doc_id, count(*) AS n_shared,
       round(sum(q.idf), 4) AS score
FROM tok t JOIN qterms q ON q.w = t.w
WHERE t.doc_id != {MLT_QUERY_DOC}
GROUP BY t.doc_id
ORDER BY score DESC, t.doc_id ASC LIMIT {MLT_K}
"""


DSL_MORE_LIKE_THIS_ORACLE = _mlt_oracle()

QUERIES["dsl_more_like_this"] = dsl_more_like_this
ORACLES["dsl_more_like_this"] = DSL_MORE_LIKE_THIS_ORACLE


def dsl_histogram_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric `histogram` with `min_doc_count: 0`: one user's sparse
    purchase values over 50-wide bins, empty bins included — the bin
    axis comes from a one-row bounds aggregate (bin-cardinality,
    bounded by the value range, not data volume)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"bool": {"must": [
            {"term": {"user_id": 7}},
            {"term": {"event_type": "purchase"}},
        ]}},
        "aggs": {"bins": {"histogram": {"field": "value",
                                        "interval": 50,
                                        "min_doc_count": 0}}},
    })


DSL_HISTOGRAM_ZEROFILL_ORACLE = """
WITH f AS (SELECT * FROM events
           WHERE user_id = 7 AND event_type = 'purchase'),
b AS (SELECT floor(value / 50) * 50 AS key, count(*) AS doc_count
      FROM f GROUP BY 1),
bounds AS (SELECT CAST(floor(min(value) / 50) AS BIGINT) AS lo,
                  CAST(floor(max(value) / 50) AS BIGINT) AS hi FROM f),
axis AS (SELECT i * CAST(50.0 AS DOUBLE) AS key
         FROM bounds, unnest(range(lo, hi + 1)) AS t(i))
SELECT axis.key, coalesce(b.doc_count, 0) AS doc_count
FROM axis LEFT JOIN b ON b.key = axis.key
ORDER BY axis.key
"""

QUERIES["dsl_histogram_zerofill"] = dsl_histogram_zerofill
ORACLES["dsl_histogram_zerofill"] = DSL_HISTOGRAM_ZEROFILL_ORACLE
