"""ES-DSL nineteenth tranche: the modern search-surface wave.

- ``combined_fields`` (ES 7.13): term-centric multi-field match —
  the one multi-field query where operator/minimum_should_match
  apply across TERMS, not fields (multi_match is field-centric).
- ``match_bool_prefix``: the type-ahead query (every term a term
  clause, the last a prefix clause, bool-should combined).
- ``min_bucket``/``max_bucket``/``sum_bucket`` sibling pipeline aggs
  in ONE body (the translator has carried them since the avg_bucket
  tranche; this pins all three with a driver row).
- ``_msearch``: the multi-search API — several bodies in one round
  trip, results tagged by slot.
- search templates: mustache-rendered bodies (``{{var}}``,
  conditional sections), rendered on the driver at plan time.
- ``rrf``: reciprocal-rank-fusion retriever (ES 8.14) — a lexical
  ranking and a vector ranking fused by 1/(k+rank).
- ``geo_polygon``: point-in-polygon membership via even-odd ray
  casting, the same crossing arithmetic on both engines.

Scale posture: every ranking is a bounded-window
TakeOrderedAndProject (never a global sort); the RRF fusion joins two
<= window_size frames (AQE broadcasts both); msearch unions K bounded
frames; geo_polygon is pure per-row arithmetic over the distinct-user
frame with no join. Reference anchor: the reference ships SIEM
sign-in docs to ES and queries them interactively
(Bootstrap.java:196-219); these are the query kinds its users run on
that index beyond the basic match/terms the earlier tranches cover.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import (
    _B_L,
    render_search_template,
    score_query,
    search,
    token_present_duck_sql,
    translate_query,
)
from parquet_generator_spark.operators.similarity import (
    cosine_to_literal,
    cosine_to_literal_duck_sql,
)
from parquet_generator_spark.plans.reference_queries9 import (
    LAT_D,
    LAT_S,
    LON_D,
    LON_S,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


_tok_duck = token_present_duck_sql


# ----------------------------------------------- dsl_combined_fields

_CF_BODY = {"combined_fields": {
    "query": "spark src3",
    "fields": ["text^2", "source"],
}}
_CF_K = 20


def dsl_combined_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``combined_fields`` query: 'spark src3' over text^2 + source as
    one combined field. Term-centric: a term matches if ANY field
    contains it ('src3' only ever hits the source field, 'spark' only
    text — exactly the case field-centric multi_match mis-scores).
    Scoring is the deterministic BM25F stand-in: per term, the
    boost-weighted count of containing fields. Top-k by score via
    TakeOrderedAndProject; rank assigned on the bounded window only.
    """
    docs = load_table(spark, "documents", sf_dir)
    top = (docs.filter(translate_query(_CF_BODY))
           .select("doc_id",
                   F.round(score_query(_CF_BODY), 4).alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(_CF_K))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "score").orderBy("rank"))


DSL_COMBINED_FIELDS_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(2.0 * (CASE WHEN {_tok_duck('text', 'spark')}
                     THEN 1 ELSE 0 END)
         + 2.0 * (CASE WHEN {_tok_duck('text', 'src3')}
                  THEN 1 ELSE 0 END)
         + 1.0 * (CASE WHEN {_tok_duck('source', 'spark')}
                  THEN 1 ELSE 0 END)
         + 1.0 * (CASE WHEN {_tok_duck('source', 'src3')}
                  THEN 1 ELSE 0 END) AS DOUBLE) AS score
  FROM documents
  WHERE {_tok_duck('text', 'spark')} OR {_tok_duck('source', 'spark')}
     OR {_tok_duck('text', 'src3')} OR {_tok_duck('source', 'src3')}),
top AS (
  SELECT doc_id, round(score, 4) AS score FROM scored
  ORDER BY score DESC, doc_id ASC LIMIT {_CF_K})
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
         AS rank,
       doc_id, score
FROM top ORDER BY rank
"""


# -------------------------------------------- dsl_match_bool_prefix

_MBP_BODY = {"match_bool_prefix": {"text": {
    "query": "window sor", "minimum_should_match": 2}}}


def dsl_match_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``match_bool_prefix`` — the type-ahead query: 'window sor'
    matches docs containing the token 'window' AND a token starting
    with 'sor' (msm=2 makes both clauses required; the last term is
    always the prefix clause). Pure codegen regex filter, one scan."""
    docs = load_table(spark, "documents", sf_dir)
    return (docs.filter(translate_query(_MBP_BODY))
            .select("doc_id", "lang", "source")
            .orderBy("doc_id"))


DSL_MATCH_BOOL_PREFIX_ORACLE = f"""
SELECT doc_id, lang, source FROM documents
WHERE {_tok_duck('text', 'window')}
  AND regexp_matches(lower(text), '{_B_L}sor')
ORDER BY doc_id
"""


# ------------------------------------------ dsl_min_max_sum_bucket

def dsl_min_max_sum_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three remaining sibling pipeline aggs in one body:
    min_bucket / max_bucket / sum_bucket of per-day purchase revenue.
    One grouped pass builds the bounded day frame; one scalar agg of
    that frame computes all three siblings (no second scan)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"revenue": {"sum": {"field": "value"}}},
            },
            "worst_day": {"min_bucket":
                          {"buckets_path": "per_day>revenue"}},
            "best_day": {"max_bucket":
                         {"buckets_path": "per_day>revenue"}},
            "total": {"sum_bucket":
                      {"buckets_path": "per_day>revenue"}},
        },
    })


_DAY_KEY = "strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')"

DSL_MIN_MAX_SUM_BUCKET_ORACLE = f"""
WITH b AS (
  SELECT {_DAY_KEY} AS key, round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT min(revenue) AS worst_day,
       max(revenue) AS best_day,
       round(sum(revenue), 4) AS total
FROM b
"""


# ------------------------------------------------------ dsl_msearch

_MSEARCH_BODIES = [
    {"query": {"bool": {"should": [
        {"match": {"text": {"query": "spark", "boost": 2.0}}},
        {"match": {"text": {"query": "shuffle", "boost": 1.0}}},
    ]}}, "size": 5},
    {"query": {"bool": {"should": [
        {"match": {"text": {"query": "vector", "boost": 1.5}}},
        {"match": {"text": {"query": "batch", "boost": 1.0}}},
    ]}}, "size": 5},
    {"query": {"dis_max": {"queries": [
        {"match": {"text": {"query": "merge", "boost": 2.0}}},
        {"match": {"text": {"query": "window", "boost": 1.0}}},
    ], "tie_breaker": 0.5}}, "size": 5},
]


def msearch(df: DataFrame, bodies: list[dict],
            id_col: str = "doc_id") -> DataFrame:
    """ES ``_msearch``: run several search bodies over one index in a
    single request; each response keeps its slot. Each body ranks its
    matches by score_query and keeps the top ``size`` via
    TakeOrderedAndProject; the union of K bounded frames is
    K * max(size) rows — never data-scale."""
    outs = []
    for slot, body in enumerate(bodies):
        q = body["query"]
        size = int(body.get("size", 10))
        top = (df.filter(translate_query(q))
               .select(F.col(id_col),
                       F.round(score_query(q), 4).alias("score"))
               .orderBy(F.desc("score"), F.asc(id_col))
               .limit(size))
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        outs.append(top
                    .withColumn("rank", F.row_number().over(w))
                    .select(F.lit(slot).alias("slot"), "rank",
                            id_col, "score"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("slot", "rank")


def dsl_msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three ranked searches in one msearch round trip (two bool-
    should scorers and a dis_max), results tagged (slot, rank)."""
    docs = load_table(spark, "documents", sf_dir)
    return msearch(docs, _MSEARCH_BODIES)


def _msearch_oracle() -> str:
    def hit(t: str, w: float) -> str:
        return (f"{w!r} * (CASE WHEN {_tok_duck('text', t)} "
                f"THEN 1 ELSE 0 END)")

    parts = []
    # slots 0/1: bool-should sum scoring, matching when any term hits
    for slot, (t1, w1, t2, w2) in enumerate(
            [("spark", 2.0, "shuffle", 1.0),
             ("vector", 1.5, "batch", 1.0)]):
        parts.append(f"""
(SELECT {slot} AS slot,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
          AS rank, doc_id, score FROM (
   SELECT doc_id,
          round(CAST({hit(t1, w1)} + {hit(t2, w2)} AS DOUBLE), 4)
            AS score
   FROM documents
   WHERE {_tok_duck('text', t1)} OR {_tok_duck('text', t2)}
   ORDER BY score DESC, doc_id ASC LIMIT 5))""")
    # slot 2: dis_max with tie_breaker 0.5
    s1, s2 = hit("merge", 2.0), hit("window", 1.0)
    parts.append(f"""
(SELECT 2 AS slot,
        CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
          AS rank, doc_id, score FROM (
   SELECT doc_id,
          round(greatest({s1}, {s2})
                + 0.5 * ({s1} + {s2} - greatest({s1}, {s2})), 4)
            AS score
   FROM documents
   WHERE {_tok_duck('text', 'merge')} OR {_tok_duck('text', 'window')}
   ORDER BY score DESC, doc_id ASC LIMIT 5))""")
    return (" UNION ALL ".join(parts)
            + " ORDER BY slot, rank")


# ----------------------------------------------- dsl_search_template

_TEMPLATE = """
{
  "query": {
    "bool": {
      "filter": [
        {"term": {"event_type": "{{etype}}"}}
        {{#with_floor}},{"range": {"value": {"gte": {{floor}}}}}
        {{/with_floor}}
      ]
    }
  },
  "aggs": {
    "by_day": {
      "date_histogram": {"field": "ts", "calendar_interval": "day"},
      "aggs": {"revenue": {"sum": {"field": "value"}}}
    }
  }
}
"""

_TEMPLATE_PARAMS = {"etype": "purchase", "with_floor": True,
                    "floor": 50}


def dsl_search_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search template: the mustache body above (a var
    substitution inside a string, a numeric substitution, and a
    conditional range section) renders on the driver at plan time,
    then runs as a plain search — daily revenue of purchases with
    value >= 50. The rendered plan is indistinguishable from the
    hand-written one (term + range push down to the scan)."""
    ev = load_table(spark, "events", sf_dir)
    body = render_search_template(_TEMPLATE, _TEMPLATE_PARAMS)
    return search(ev, body)


DSL_SEARCH_TEMPLATE_ORACLE = f"""
SELECT {_DAY_KEY} AS key,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 4) AS revenue
FROM events
WHERE event_type = 'purchase' AND value >= 50
GROUP BY key ORDER BY key
"""


# ---------------------------------------------------------- dsl_rrf

_RRF_TEXT_Q = {"dis_max": {"queries": [
    {"match": {"text": {"query": "join", "boost": 2.0}}},
    {"match": {"text": {"query": "hash", "boost": 1.5}}},
    {"match": {"text": {"query": "sort", "boost": 1.0}}},
], "tie_breaker": 0.3}}
_RRF_QV = [round(math.cos(0.9 * i + 0.7), 4) for i in range(64)]
_RRF_WINDOW = 40      # rank_window_size
_RRF_CONST = 60       # rank_constant k
_RRF_K = 12


def dsl_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.14 ``rrf`` retriever: fuse a lexical ranking (dis_max
    over documents) with a vector ranking (cosine vs a literal query
    vector over embeddings, joined on vec_id = doc_id) by reciprocal
    rank: score = sum over retrievers of 1/(rank_constant + rank),
    ranks only counted inside rank_window_size. Each leg is a
    bounded TakeOrderedAndProject; the fusion is a full-outer join
    of two <= window_size frames (AQE broadcasts both), so nothing
    data-scale is sorted or shuffled."""
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    t_top = (docs.filter(translate_query(_RRF_TEXT_Q))
             .select("doc_id",
                     F.round(score_query(_RRF_TEXT_Q), 4).alias("s"))
             .orderBy(F.desc("s"), F.asc("doc_id"))
             .limit(_RRF_WINDOW))
    tw = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    t_rank = (t_top.withColumn("text_rank", F.row_number().over(tw))
              .select(F.col("doc_id").alias("id"), "text_rank"))

    cos = cosine_to_literal("embedding", _RRF_QV)
    v_top = (emb.select(F.col("vec_id").alias("id"), cos.alias("c"))
             .orderBy(F.desc("c"), F.asc("id"))
             .limit(_RRF_WINDOW))
    vw = Window.orderBy(F.desc("c"), F.asc("id"))
    v_rank = (v_top.withColumn("vec_rank", F.row_number().over(vw))
              .select("id", "vec_rank"))

    rrf = (F.coalesce(1.0 / (F.lit(_RRF_CONST)
                             + F.col("text_rank")), F.lit(0.0))
           + F.coalesce(1.0 / (F.lit(_RRF_CONST)
                               + F.col("vec_rank")), F.lit(0.0)))
    return (t_rank.join(v_rank, "id", "full_outer")
            .select("id", "text_rank", "vec_rank",
                    F.round(rrf, 6).alias("rrf_score"))
            .orderBy(F.desc("rrf_score"), F.asc("id"))
            .limit(_RRF_K))


def _rrf_oracle() -> str:
    def hit(t: str, w: float) -> str:
        return (f"{w!r} * (CASE WHEN {_tok_duck('text', t)} "
                f"THEN 1 ELSE 0 END)")

    s1, s2, s3 = hit("join", 2.0), hit("hash", 1.5), hit("sort", 1.0)
    cos_sql = cosine_to_literal_duck_sql(
        "CAST(embedding AS DOUBLE[])", _RRF_QV)
    return f"""
WITH t_top AS (
  SELECT doc_id AS id,
         round(greatest({s1}, {s2}, {s3})
               + 0.3 * ({s1} + {s2} + {s3}
                        - greatest({s1}, {s2}, {s3})), 4) AS s
  FROM documents
  WHERE {_tok_duck('text', 'join')} OR {_tok_duck('text', 'hash')}
     OR {_tok_duck('text', 'sort')}
  ORDER BY s DESC, id ASC LIMIT {_RRF_WINDOW}),
t_rank AS (
  SELECT id, CAST(row_number() OVER (ORDER BY s DESC, id) AS INT)
           AS text_rank
  FROM t_top),
v_top AS (
  SELECT vec_id AS id, {cos_sql} AS c
  FROM embeddings
  ORDER BY c DESC, id ASC LIMIT {_RRF_WINDOW}),
v_rank AS (
  SELECT id, CAST(row_number() OVER (ORDER BY c DESC, id) AS INT)
           AS vec_rank
  FROM v_top)
SELECT coalesce(t_rank.id, v_rank.id) AS id,
       text_rank, vec_rank,
       round(coalesce(1.0 / ({_RRF_CONST} + text_rank), 0.0)
             + coalesce(1.0 / ({_RRF_CONST} + vec_rank), 0.0), 6)
         AS rrf_score
FROM t_rank FULL OUTER JOIN v_rank ON t_rank.id = v_rank.id
ORDER BY rrf_score DESC, id ASC LIMIT {_RRF_K}
"""


# -------------------------------------------------- dsl_geo_polygon

# (lat, lon) vertices, counter-clockwise, inside the planted
# coordinate domain (lat 45.0-54.6, lon 5.0-25.0)
_POLY = [(47.0, 7.0), (53.0, 9.0), (54.0, 18.0),
         (49.0, 24.0), (45.5, 14.0)]


def _pnpoly_sql(lat: str, lon: str) -> str:
    """Even-odd ray casting (PNPOLY): count edges a horizontal ray
    from the point crosses; odd = inside. The SAME expression text
    evaluates on both engines, so float behavior is identical."""
    terms = []
    n = len(_POLY)
    for i in range(n):
        y1, x1 = _POLY[i]
        y2, x2 = _POLY[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({lat}) < {y1!r}) <> (({lat}) < {y2!r}) "
            f"AND ({lon}) < ({x2!r} - {x1!r}) * (({lat}) - {y1!r}) "
            f"/ ({y2!r} - {y1!r}) + {x1!r} THEN 1 ELSE 0 END)")
    return "((" + " + ".join(terms) + ") % 2) = 1"


def dsl_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_polygon`` query: users whose planted geo point falls
    inside a 5-vertex polygon, by even-odd ray casting — per-row
    arithmetic over the distinct-user frame, no join, no UDF. (ES
    deprecates geo_polygon in favor of geo_shape; both are served —
    dsl_geo_shape covers envelopes/circles, this covers arbitrary
    simple polygons.)"""
    ev = load_table(spark, "events", sf_dir)
    users = ev.select("user_id").distinct()
    inside = _pnpoly_sql(LAT_S, LON_S)
    return (users.filter(F.expr(inside))
            .select("user_id",
                    F.round(F.expr(LAT_S), 4).alias("lat"),
                    F.round(F.expr(LON_S), 4).alias("lon"))
            .orderBy("user_id"))


DSL_GEO_POLYGON_ORACLE = f"""
WITH users AS (SELECT DISTINCT user_id FROM events)
SELECT user_id,
       round({LAT_D}, 4) AS lat,
       round({LON_D}, 4) AS lon
FROM users
WHERE {_pnpoly_sql(LAT_D, LON_D)}
ORDER BY user_id
"""


QUERIES.update({
    "dsl_combined_fields": dsl_combined_fields,
    "dsl_match_bool_prefix": dsl_match_bool_prefix,
    "dsl_min_max_sum_bucket": dsl_min_max_sum_bucket,
    "dsl_msearch": dsl_msearch,
    "dsl_search_template": dsl_search_template,
    "dsl_rrf": dsl_rrf,
    "dsl_geo_polygon": dsl_geo_polygon,
})
ORACLES.update({
    "dsl_combined_fields": DSL_COMBINED_FIELDS_ORACLE,
    "dsl_match_bool_prefix": DSL_MATCH_BOOL_PREFIX_ORACLE,
    "dsl_min_max_sum_bucket": DSL_MIN_MAX_SUM_BUCKET_ORACLE,
    "dsl_msearch": _msearch_oracle(),
    "dsl_search_template": DSL_SEARCH_TEMPLATE_ORACLE,
    "dsl_rrf": _rrf_oracle(),
    "dsl_geo_polygon": DSL_GEO_POLYGON_ORACLE,
})
