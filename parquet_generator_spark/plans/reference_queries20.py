"""ES-DSL twentieth tranche: high-cardinality paging, geo rings,
the remaining span compounds, and pre-RRF hybrid scoring.

- ``terms`` partitioning (`include: {partition, num_partitions}`):
  THE mechanism for paging a billion-key terms agg (the reference's
  rule_name terms agg over SIEM data grows unbounded with rule
  count). The hash filter applies to the raw key map-side, before
  the shuffle, so each page moves ~1/P of the keys.
- ``geo_distance`` AGG (ring buckets around a point) — the query
  twin (dsl_geo_distance) landed in tranche 9; this is the
  aggregation face with ES's "*-150.0" ring keys.
- ``span_or`` + ``span_not``: the last commonly used span
  compounds (union of spans; include-span with an exclusion zone),
  over the same analyzed-position machinery as span_near/
  span_first.
- hybrid query+knn scoring (ES 8.4 style, pre-RRF): script-free
  additive fusion — query score + boost x cosine over each leg's
  bounded top window, the linear complement of dsl_rrf's rank
  fusion.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import (
    score_query,
    search,
    span_not_pred_sql,
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
    _haversine_sql,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


_tok_duck = token_present_duck_sql


# --------------------------------------------- dsl_terms_partition

_TP_PARTITION, _TP_NUM = 3, 20
_TP_SIZE = 15


def dsl_terms_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned terms agg: page 3 of 20 over the user_id key
    space, top spenders within the page. The md5 partition filter
    evaluates on the RAW key before the groupBy (map-side), so a
    page shuffles ~1/20 of the keys — ES's exact motive for the
    feature (a single terms response over billions of keys cannot
    materialize)."""
    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"spenders": {
            "terms": {"field": "user_id", "size": _TP_SIZE,
                      "include": {"partition": _TP_PARTITION,
                                  "num_partitions": _TP_NUM},
                      "order": {"spend": "desc"}},
            "aggs": {"spend": {"sum": {"field": "value"}}},
        }},
    })


DSL_TERMS_PARTITION_ORACLE = f"""
SELECT user_id AS key,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 4) AS spend
FROM events
WHERE event_type = 'purchase'
  AND CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
           AS BIGINT) % {_TP_NUM} = {_TP_PARTITION}
GROUP BY user_id
ORDER BY spend DESC, key ASC
LIMIT {_TP_SIZE}
"""


# ----------------------------------------- dsl_geo_distance_rings

_RING_EDGES = [150.0, 300.0]
_G_CLAT, _G_CLON = 49.0, 13.0


def _ring_key_sql(dist: str) -> str:
    """ES geo_distance ring keys ("*-150.0", "150.0-300.0",
    "300.0-*"), derived from _RING_EDGES so the configured edges ARE
    the executed edges."""
    out, lo = "", "*"
    for e in _RING_EDGES:
        out += f"WHEN ({dist}) < {e!r} THEN '{lo}-{e}' "
        lo = e
    return f"CASE {out}ELSE '{_RING_EDGES[-1]}-*' END"


def dsl_geo_distance_rings(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """``geo_distance`` AGG: ring buckets (<150 km, 150-300, 300+)
    around a center point over per-user planted coordinates, with
    ES's ring keys and a mean-distance metric per ring. Haversine is
    per-row arithmetic; one 3-bucket groupBy — the bucket count is
    fixed by the request, never by the data."""
    ev = load_table(spark, "events", sf_dir)
    users = ev.select("user_id").distinct()
    dist = _haversine_sql(LAT_S, LON_S, _G_CLAT, _G_CLON)
    return (users
            .select(F.expr(_ring_key_sql(dist)).alias("key"),
                    F.expr(dist).alias("d"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.avg("d"), 2).alias("avg_km"))
            .orderBy("key"))


def _geo_rings_oracle() -> str:
    dist = _haversine_sql(LAT_D, LON_D, _G_CLAT, _G_CLON)
    return f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
d AS (SELECT {_ring_key_sql(dist)} AS key, {dist} AS d FROM users)
SELECT key, CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(d), 2) AS avg_km
FROM d GROUP BY key ORDER BY key
"""


# --------------------------------------------------- dsl_span_or_not

_SPAN_Q = {"bool": {
    "must": [{"span_not": {
        "include": {"span_term": {"text": "spark"}},
        "exclude": {"span_term": {"text": "slow"}},
        "pre": 1, "post": 1}}],
    "should": [{"span_or": {"clauses": [
        {"span_term": {"text": "window"}},
        {"span_term": {"text": "merge"}},
    ]}}],
    "minimum_should_match": 1,
}}


def dsl_span_or_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span_not`` + ``span_or`` composed under bool: docs with an
    occurrence of 'spark' that has NO 'slow' adjacent to it (one
    token either side), that also mention 'window' or 'merge'.
    span_not runs on analyzed token positions (nested list lambda —
    no UDF, no explode); span_or is a plain token-regex union."""
    docs = load_table(spark, "documents", sf_dir)
    return (docs.filter(translate_query(_SPAN_Q))
            .select("doc_id", "lang")
            .orderBy("doc_id"))


def _span_or_not_oracle() -> str:
    sn = span_not_pred_sql("text", "spark", "slow", 1, 1,
                           engine="duck")
    return f"""
SELECT doc_id, lang FROM documents
WHERE ({sn})
  AND ({_tok_duck('text', 'window')} OR {_tok_duck('text', 'merge')})
ORDER BY doc_id
"""


# --------------------------------------------------- dsl_hybrid_score

_HY_TEXT_Q = {"dis_max": {"queries": [
    {"match": {"text": {"query": "scan", "boost": 2.0}}},
    {"match": {"text": {"query": "filter", "boost": 1.5}}},
    {"match": {"text": {"query": "batch", "boost": 1.0}}},
], "tie_breaker": 0.3}}
_HY_QV = [round(math.sin(1.3 * i + 0.2), 4) for i in range(64)]
_HY_WINDOW = 40
_HY_KNN_BOOST = 2.0
_HY_K = 12


def dsl_hybrid_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-RRF hybrid search (ES 8.4 `query` + `knn` in one body):
    additive score fusion — a doc's final score is its query score
    plus boost x cosine, each contribution present only when the doc
    is in that leg's top window (ES scores knn only for the
    num_candidates survivors). Same bounded two-leg skeleton as
    dsl_rrf, LINEAR fusion instead of rank fusion — the two APIs
    answer differently when score scales are comparable vs not."""
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    t_top = (docs.filter(translate_query(_HY_TEXT_Q))
             .select(F.col("doc_id").alias("id"),
                     F.round(score_query(_HY_TEXT_Q), 4).alias("qs"))
             .orderBy(F.desc("qs"), F.asc("id"))
             .limit(_HY_WINDOW))

    cos = cosine_to_literal("embedding", _HY_QV)
    v_top = (emb.select(F.col("vec_id").alias("id"), cos.alias("vs"))
             .orderBy(F.desc("vs"), F.asc("id"))
             .limit(_HY_WINDOW))

    hybrid = (F.coalesce(F.col("qs"), F.lit(0.0))
              + F.lit(_HY_KNN_BOOST)
              * F.coalesce(F.col("vs"), F.lit(0.0)))
    return (t_top.join(v_top, "id", "full_outer")
            .select("id", "qs", "vs",
                    F.round(hybrid, 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(_HY_K))


def _hybrid_oracle() -> str:
    def hit(t: str, w: float) -> str:
        return (f"{w!r} * (CASE WHEN {_tok_duck('text', t)} "
                f"THEN 1 ELSE 0 END)")

    s1, s2, s3 = hit("scan", 2.0), hit("filter", 1.5), hit("batch", 1.0)
    cos_sql = cosine_to_literal_duck_sql(
        "CAST(embedding AS DOUBLE[])", _HY_QV)
    return f"""
WITH t_top AS (
  SELECT doc_id AS id,
         round(greatest({s1}, {s2}, {s3})
               + 0.3 * ({s1} + {s2} + {s3}
                        - greatest({s1}, {s2}, {s3})), 4) AS qs
  FROM documents
  WHERE {_tok_duck('text', 'scan')} OR {_tok_duck('text', 'filter')}
     OR {_tok_duck('text', 'batch')}
  ORDER BY qs DESC, id ASC LIMIT {_HY_WINDOW}),
v_top AS (
  SELECT vec_id AS id, {cos_sql} AS vs
  FROM embeddings
  ORDER BY vs DESC, id ASC LIMIT {_HY_WINDOW})
SELECT coalesce(t_top.id, v_top.id) AS id, qs, vs,
       round(coalesce(qs, 0.0) + {_HY_KNN_BOOST!r}
             * coalesce(vs, 0.0), 4) AS score
FROM t_top FULL OUTER JOIN v_top ON t_top.id = v_top.id
ORDER BY score DESC, id ASC LIMIT {_HY_K}
"""


# ------------------------------------------------------ dsl_rule_query

_QUERY_RULES = [
    {"rule_id": "promo-spark", "type": "pinned",
     "criteria": [{"type": "contains", "metadata": "user_query",
                   "values": ["spark"]}],
     "ids": [42, 7]},
    {"rule_id": "hide-legacy", "type": "exclude",
     "criteria": [{"type": "exact", "metadata": "user_lang",
                   "values": ["en"]}],
     "ids": [3, 11]},
    {"rule_id": "never-fires", "type": "pinned",
     "criteria": [{"type": "exact", "metadata": "user_query",
                   "values": ["tensor"]}],
     "ids": [999]},
]
_RULE_METADATA = {"user_query": "spark joins", "user_lang": "en"}
_RULE_K = 12


def _criteria_match(crit: dict, metadata: dict) -> bool:
    v = metadata.get(crit["metadata"])
    if v is None:
        return False
    if crit["type"] == "exact":
        return any(v == x for x in crit["values"])
    if crit["type"] == "contains":
        return any(x in v for x in crit["values"])
    if crit["type"] == "prefix":
        return any(v.startswith(x) for x in crit["values"])
    raise ValueError(f"unsupported rule criteria {crit['type']!r}")


def resolve_query_rules(rules: list[dict],
                        metadata: dict) -> tuple[list[int], list[int]]:
    """ES 8.10 query rules: rules whose criteria ALL match the
    request metadata activate; pinned ids promote in rule order,
    exclude ids drop. Resolution is pure driver-side logic on the
    (small, curated) ruleset — by the time Spark sees anything, the
    rules are two literal id lists."""
    pinned: list[int] = []
    excluded: list[int] = []
    for r in rules:
        if all(_criteria_match(c, metadata) for c in r["criteria"]):
            dest = pinned if r["type"] == "pinned" else excluded
            for i in r["ids"]:
                if i not in dest:
                    dest.append(i)
    return pinned, excluded


def dsl_rule_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rule_query` (ES 8.10 query rules): the curated-search layer —
    for this request's metadata the 'promo-spark' rule fires (pins
    42, 7), 'hide-legacy' fires (excludes 3, 11), 'never-fires'
    doesn't. Rules resolve on the driver at plan time; the executed
    plan is dsl_pinned's shape (array_position projection + bounded
    TakeOrdered) plus a NOT IN filter — no joins, nothing data-scale."""
    docs = load_table(spark, "documents", sf_dir)
    pinned, excluded = resolve_query_rules(_QUERY_RULES, _RULE_METADATA)
    pin_rank = F.array_position(
        F.array(*[F.lit(i).cast("long") for i in pinned]),
        F.col("doc_id"))
    organic = translate_query({"match": {"text": "spark"}})
    kept = (docs.withColumn("pin", pin_rank)
            .filter(((F.col("pin") > 0) | organic)
                    & ~F.col("doc_id").isin(excluded)))
    order = [(F.col("pin") > 0).desc(), F.col("pin").asc(),
             F.col("doc_id").asc()]
    top = kept.orderBy(*order).limit(_RULE_K)
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id",
                    (F.col("pin") > 0).alias("pinned"))
            .orderBy("rank"))


def _rule_query_oracle() -> str:
    pinned, excluded = resolve_query_rules(_QUERY_RULES, _RULE_METADATA)
    exc = ", ".join(str(i) for i in excluded)
    return f"""
WITH kept AS (
  SELECT doc_id,
         list_position({pinned}, doc_id) AS pin
  FROM documents
  WHERE (list_position({pinned}, doc_id) > 0
         OR {_tok_duck('text', 'spark')})
    AND doc_id NOT IN ({exc}))
SELECT CAST(row_number() OVER
            (ORDER BY (pin > 0) DESC, pin, doc_id) AS INT) AS rank,
       doc_id, pin > 0 AS pinned
FROM kept
ORDER BY (pin > 0) DESC, pin, doc_id
LIMIT {_RULE_K}
"""


QUERIES.update({
    "dsl_terms_partition": dsl_terms_partition,
    "dsl_geo_distance_rings": dsl_geo_distance_rings,
    "dsl_span_or_not": dsl_span_or_not,
    "dsl_hybrid_score": dsl_hybrid_score,
    "dsl_rule_query": dsl_rule_query,
})
ORACLES.update({
    "dsl_terms_partition": DSL_TERMS_PARTITION_ORACLE,
    "dsl_geo_distance_rings": _geo_rings_oracle(),
    "dsl_span_or_not": _span_or_not_oracle(),
    "dsl_hybrid_score": _hybrid_oracle(),
    "dsl_rule_query": _rule_query_oracle(),
})
