"""ES-DSL eleventh tranche: Lucene positional + set-membership +
curated-ranking queries — `span_near` (proximity with slop),
`terms_set` (k-of-m term membership), `function_score.random_score`
(seeded deterministic sampling order), and the `pinned` query
(editorially promoted ids above organic results).

Scale posture: span_near/terms_set compile to per-row regex/count
arithmetic in whole-stage codegen (no join, no shuffle, pushdown
unaffected); random_score ranks by a seeded md5 hash (ES's
random_score with seed+field is equally deterministic) through
TakeOrderedAndProject; pinned is one array_position projection —
the pin list is a query literal, never a join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import (
    _B_L,
    _B_R,
    search,
    translate_query,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# token-boundary pieces imported from esdsl (single source of truth)
_GAP = "([^a-z0-9]+[a-z0-9]+)"

SPAN_SLOP = 2


def dsl_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`span_near` proximity: "spark" and "window" within SPAN_SLOP
    intervening tokens, any order (`in_order: false`), faceted by
    source. The gap count is exact — the regex counts intervening
    tokens directly."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"span_near": {
            "clauses": [{"span_term": {"text": "spark"}},
                        {"span_term": {"text": "window"}}],
            "slop": SPAN_SLOP, "in_order": False}},
        "aggs": {"by_source": {"terms": {"field": "source",
                                         "size": 25}}},
    }))


def _near(a: str, b: str) -> str:
    return f"{_B_L}{a}{_GAP}{{0,{SPAN_SLOP}}}[^a-z0-9]+{b}{_B_R}"


DSL_SPAN_NEAR_ORACLE = f"""
SELECT source AS key, count(*) AS doc_count
FROM documents
WHERE regexp_matches(lower(text), '{_near("spark", "window")}')
   OR regexp_matches(lower(text), '{_near("window", "spark")}')
GROUP BY key ORDER BY doc_count DESC, key ASC
LIMIT 25
"""


TERMS_SET = ["spark", "window", "agg", "merge"]
TERMS_SET_MIN = 3


def dsl_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`terms_set`: documents containing at least TERMS_SET_MIN of
    the four query terms (constant minimum via
    minimum_should_match_script, the ES idiom) — k-of-m as a sum of
    codegen int casts, faceted by lang."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"terms_set": {"text": {
            "terms": TERMS_SET,
            "minimum_should_match_script": {
                "source": str(TERMS_SET_MIN)}}}},
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}}},
    }))


def _hits_sql() -> str:
    return " + ".join(
        f"CASE WHEN regexp_matches(lower(text), "
        f"'{_B_L}{t}{_B_R}') THEN 1 ELSE 0 END"
        for t in TERMS_SET)


DSL_TERMS_SET_ORACLE = f"""
SELECT lang AS key, count(*) AS doc_count
FROM documents
WHERE ({_hits_sql()}) >= {TERMS_SET_MIN}
GROUP BY key ORDER BY doc_count DESC, key ASC
LIMIT 10
"""


RANDOM_SEED = 7
RANDOM_K = 15


def dsl_random_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`function_score` with `random_score` (seed + field): ES's
    seeded random scoring IS deterministic — here the score is a
    seeded md5 hash of doc_id scaled to [0, 1), identical on both
    engines, over docs matching the inner query. The canonical
    reproducible-sample ranking; top-k via TakeOrderedAndProject."""
    docs = load_table(spark, "documents", sf_dir)
    score = (F.expr(
        f"cast(conv(substring(md5(concat('{RANDOM_SEED}:', "
        f"cast(doc_id as string))), 1, 8), 16, 10) AS BIGINT)")
        % 100000) / 100000.0
    matched = docs.filter(translate_query({"match": {"text": "table"}}))
    top = (matched.select("doc_id", F.round(score, 5).alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(RANDOM_K))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "score").orderBy("rank"))


DSL_RANDOM_SCORE_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         round((CAST(concat('0x', substr(md5(concat('{RANDOM_SEED}:',
                CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
                % 100000) / 100000.0, 5) AS score
  FROM documents
  WHERE regexp_matches(lower(text), '{_B_L}table{_B_R}'))
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
         AS rank,
       doc_id, score
FROM scored ORDER BY score DESC, doc_id
LIMIT {RANDOM_K}
"""


PINNED_IDS = [42, 7, 101]
PINNED_K = 12


def dsl_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pinned` query: the promoted ids rank first IN THE GIVEN
    ORDER, then the organic matches (here: match "spark", sorted by
    doc_id). Pin rank is one array_position against the literal pin
    list — a projection, not a join."""
    docs = load_table(spark, "documents", sf_dir)
    pin_rank = F.array_position(
        F.array(*[F.lit(i).cast("long") for i in PINNED_IDS]),
        F.col("doc_id"))
    organic = translate_query({"match": {"text": "spark"}})
    kept = (docs.withColumn("pin", pin_rank)
            .filter((F.col("pin") > 0) | organic))
    order = [(F.col("pin") > 0).desc(), F.col("pin").asc(),
             F.col("doc_id").asc()]
    top = kept.orderBy(*order).limit(PINNED_K)
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id",
                    (F.col("pin") > 0).alias("pinned"))
            .orderBy("rank"))


DSL_PINNED_ORACLE = f"""
WITH kept AS (
  SELECT doc_id,
         list_position({PINNED_IDS}, doc_id) AS pin
  FROM documents
  WHERE list_position({PINNED_IDS}, doc_id) > 0
     OR regexp_matches(lower(text), '{_B_L}spark{_B_R}'))
SELECT CAST(row_number() OVER
            (ORDER BY (pin > 0) DESC, pin, doc_id) AS INT) AS rank,
       doc_id, pin > 0 AS pinned
FROM kept
ORDER BY (pin > 0) DESC, pin, doc_id
LIMIT {PINNED_K}
"""


def dsl_geo_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone `geo_centroid` metric agg per terms bucket: the
    centroid of each event_type's points (the ES bucket+metric
    shape; geohash_grid carries the gridded variant). One grouped
    pass over per-row runtime-field coordinates."""
    from parquet_generator_spark.plans.reference_queries9 import (
        LAT_S,
        LON_S,
    )
    ev = load_table(spark, "events", sf_dir)
    return (ev.select(F.col("event_type").alias("key"),
                      F.expr(LAT_S).cast("double").alias("lat"),
                      F.expr(LON_S).cast("double").alias("lon"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.avg("lat"), 4).alias("centroid_lat"),
                 F.round(F.avg("lon"), 4).alias("centroid_lon"))
            .orderBy(F.desc("doc_count"), F.asc("key")))


def _geo_centroid_oracle() -> str:
    from parquet_generator_spark.plans.reference_queries9 import (
        LAT_D,
        LON_D,
    )
    return f"""
SELECT event_type AS key, count(*) AS doc_count,
       round(avg({LAT_D}), 4) AS centroid_lat,
       round(avg({LON_D}), 4) AS centroid_lon
FROM events
GROUP BY key ORDER BY doc_count DESC, key ASC
"""


QUERIES.update({
    "dsl_span_near": dsl_span_near,
    "dsl_terms_set": dsl_terms_set,
    "dsl_random_score": dsl_random_score,
    "dsl_pinned": dsl_pinned,
    "dsl_geo_centroid": dsl_geo_centroid,
})
ORACLES.update({
    "dsl_span_near": DSL_SPAN_NEAR_ORACLE,
    "dsl_terms_set": DSL_TERMS_SET_ORACLE,
    "dsl_random_score": DSL_RANDOM_SCORE_ORACLE,
    "dsl_pinned": DSL_PINNED_ORACLE,
    "dsl_geo_centroid": _geo_centroid_oracle(),
})
