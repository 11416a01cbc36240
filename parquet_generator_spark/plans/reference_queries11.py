"""ES-DSL tenth tranche: the user-facing query-bar surface —
`query_string` / `simple_query_string` (the most-typed ES queries in
practice; the reference's own match_all / bool+match_phrase usage at
Bootstrap.java:272 and EsParquetWriter.java:69 generalizes straight
into them), `match_phrase_prefix` (search-as-you-type), the compound
relevance trio `dis_max` / `constant_score` / `boosting`, and the
other half of the geo-agg family: `geohash_grid` with a
`geo_centroid` sub-agg.

Scale posture: every query_string leaf compiles to a JVM-side rlike
over the scanned column — one narrow predicate per document, no
Python, no join; the relevance query is pure CASE arithmetic + a
TakeOrderedAndProject top-k; geohash bucketing is bit arithmetic
generated ONCE as engine-neutral SQL text (floor/div/mod — the
Morton-interleave recipe of sinks/maintenance.py:59 in base-32
clothing), one grouped pass.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import (
    _B_L,
    _B_R,
    _SEP,
    phrase_prefix_regex,
    phrase_regex,
    score_query,
    search,
    translate_query,
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


def _tok_re(t: str) -> str:
    return _B_L + re.escape(t) + _B_R


QS_QUERY = '((spark AND window) OR "merge batch" OR quer?) AND NOT slow'


def dsl_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`query_string` over documents.text — parens, AND/OR/NOT,
    a quoted phrase and a `?` token wildcard in one expression —
    faceted by source. The parsed tree compiles to nested boolean
    rlike predicates evaluated in whole-stage codegen."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"query_string": {
            "query": QS_QUERY, "fields": ["text"],
            "default_operator": "OR"}},
        "aggs": {"by_source": {"terms": {"field": "source",
                                         "size": 25}}},
    }))


DSL_QUERY_STRING_ORACLE = f"""
SELECT source AS key, count(*) AS doc_count
FROM documents
WHERE ((regexp_matches(lower(text), '{_tok_re("spark")}')
        AND regexp_matches(lower(text), '{_tok_re("window")}'))
       OR regexp_matches(lower(text), '{phrase_regex("merge batch")}')
       OR regexp_matches(lower(text),
                         '{_B_L}quer[a-z0-9]{_B_R}'))
  AND NOT regexp_matches(lower(text), '{_tok_re("slow")}')
GROUP BY key ORDER BY doc_count DESC, key ASC
LIMIT 25
"""


SQS_QUERY = 'fast + big -slow | "merge batch" | vec*'


def dsl_simple_query_string(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """`simple_query_string` over documents.text: `+`/`|` infix
    operators, `-` negation, a quoted phrase and a trailing-`*`
    prefix term, folded left-to-right (the SimpleQueryParser
    contract), faceted by lang."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"simple_query_string": {
            "query": SQS_QUERY, "fields": ["text"],
            "default_operator": "AND"}},
        "aggs": {"by_lang": {"terms": {"field": "lang", "size": 10}}},
    }))


# left-to-right: (((fast AND big) AND NOT slow) OR "merge batch")
#                OR prefix(vec)
DSL_SIMPLE_QUERY_STRING_ORACLE = f"""
SELECT lang AS key, count(*) AS doc_count
FROM documents
WHERE (((regexp_matches(lower(text), '{_tok_re("fast")}')
         AND regexp_matches(lower(text), '{_tok_re("big")}'))
        AND NOT regexp_matches(lower(text), '{_tok_re("slow")}'))
       OR regexp_matches(lower(text), '{phrase_regex("merge batch")}'))
   OR regexp_matches(lower(text), '{_B_L}vec')
GROUP BY key ORDER BY doc_count DESC, key ASC
LIMIT 10
"""


MPP_QUERY = "sort ta"


def dsl_match_phrase_prefix(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """`match_phrase_prefix`: the analyzed token sequence with the
    last token matched as a prefix ("sort ta" finds "sort table") —
    one rlike, faceted by source."""
    docs = load_table(spark, "documents", sf_dir)
    return (search(docs, {
        "query": {"match_phrase_prefix": {"text": MPP_QUERY}},
        "aggs": {"by_source": {"terms": {"field": "source",
                                         "size": 25}}},
    }))


DSL_MATCH_PHRASE_PREFIX_ORACLE = f"""
SELECT source AS key, count(*) AS doc_count
FROM documents
WHERE regexp_matches(lower(text), '{phrase_prefix_regex(MPP_QUERY)}')
GROUP BY key ORDER BY doc_count DESC, key ASC
LIMIT 25
"""


RELEVANCE_Q = {"boosting": {
    "positive": {"dis_max": {
        "queries": [
            {"constant_score": {
                "filter": {"match_phrase": {"text": "sort table"}},
                "boost": 3.0}},
            {"constant_score": {
                "filter": {"match": {"text": "spark"}},
                "boost": 2.0}},
            {"term": {"lang": {"value": "en", "boost": 1.5}}},
        ],
        "tie_breaker": 0.3}},
    "negative": {"match": {"text": "slow"}},
    "negative_boost": 0.5,
}}
RELEVANCE_K = 20


def dsl_dis_max_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compound relevance trio in one ranked query: three
    `constant_score`/boosted leaves under a `dis_max`
    (score = best + tie_breaker * rest — the ES tie-breaker: the
    winning clause counts fully, other matching clauses only their
    tie_breaker fraction), wrapped in `boosting` (docs matching the
    negative query are DEMOTED by negative_boost, never dropped).
    Matching = the positive dis_max (any clause); top-k via
    orderBy().limit() -> TakeOrderedAndProject, rank derived over the
    k survivors only."""
    docs = load_table(spark, "documents", sf_dir)
    scored = (docs.filter(translate_query(RELEVANCE_Q))
              .select("doc_id",
                      F.round(score_query(RELEVANCE_Q), 4)
                      .alias("score")))
    top = (scored.orderBy(F.desc("score"), F.asc("doc_id"))
           .limit(RELEVANCE_K))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "score").orderBy("rank"))


DSL_DIS_MAX_BOOSTING_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(lower(text),
                   '{phrase_regex("sort table")}')
              THEN 3.0 ELSE 0.0 END AS s1,
         CASE WHEN regexp_matches(lower(text), '{_tok_re("spark")}')
              THEN 2.0 ELSE 0.0 END AS s2,
         CASE WHEN lang = 'en' THEN 1.5 ELSE 0.0 END AS s3,
         CASE WHEN regexp_matches(lower(text), '{_tok_re("slow")}')
              THEN 0.5 ELSE 1.0 END AS demote
  FROM documents),
ranked AS (
  SELECT doc_id,
         round((greatest(s1, s2, s3)
                + 0.3 * (s1 + s2 + s3 - greatest(s1, s2, s3)))
               * demote, 4) AS score
  FROM scored
  WHERE s1 > 0 OR s2 > 0 OR s3 > 0)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
            AS INT) AS rank,
       doc_id, score
FROM ranked
ORDER BY score DESC, doc_id
LIMIT {RELEVANCE_K}
"""


# ------------------------------------------------- geohash_grid

GEOHASH_PRECISION = 4
_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
# 5 bits per char; lon takes the even bit positions (MSB first), so
# with an even total the axes split the bits equally
_GH_BITS = 5 * GEOHASH_PRECISION
_GH_LON_BITS = (_GH_BITS + 1) // 2
_GH_LAT_BITS = _GH_BITS // 2


def _bit(x: str, i: int) -> str:
    """Engine-neutral bit extraction (works verbatim in Spark SQL and
    DuckDB): integer values up to 2^20 stay exact in the double
    floor-division."""
    return f"(CAST(floor({x} / {1 << i}.0) AS BIGINT) % 2)"


def geohash_cell_exprs(lat: str, lon: str) -> tuple[str, str]:
    """Integer cell indices along each axis at the target bit depth.
    Clamped to 2^bits - 1: lat=90 / lon=180 would otherwise index
    2^bits, whose low bits are all zero — encoding the north pole as
    the south pole (the bisection encoder keeps the boundary in the
    last cell)."""
    ix = (f"CAST(least(floor((({lon}) + 180.0) / 360.0 "
          f"* {1 << _GH_LON_BITS}), {(1 << _GH_LON_BITS) - 1}) "
          f"AS BIGINT)")
    iy = (f"CAST(least(floor((({lat}) + 90.0) / 180.0 "
          f"* {1 << _GH_LAT_BITS}), {(1 << _GH_LAT_BITS) - 1}) "
          f"AS BIGINT)")
    return ix, iy


def geohash_expr(ix: str, iy: str) -> str:
    """Base-32 geohash from the two cell indices: interleave bits
    lon-first (the geohash spec), then map each 5-bit group onto the
    geohash alphabet — pure floor/div/mod SQL text shared verbatim by
    both engines."""
    chars = []
    for c in range(GEOHASH_PRECISION):
        terms = []
        for j in range(5):
            k = 5 * c + j
            if k % 2 == 0:
                src, idx = ix, _GH_LON_BITS - 1 - k // 2
            else:
                src, idx = iy, _GH_LAT_BITS - 1 - (k - 1) // 2
            terms.append(f"{_bit(src, idx)} * {1 << (4 - j)}")
        v = " + ".join(terms)
        chars.append(f"substr('{_GH_ALPHABET}', "
                     f"CAST(({v}) AS INT) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def geohash_encode(lat: float, lon: float,
                   precision: int = GEOHASH_PRECISION) -> str:
    """Plain-Python reference geohash encoder (classic bisection
    form) — pins the SQL bit-arithmetic version in tests."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits: list[int] = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for c in range(precision):
        v = 0
        for j in range(5):
            v = (v << 1) | bits[5 * c + j]
        out.append(_GH_ALPHABET[v])
    return "".join(out)


def dsl_geohash_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geohash_grid` agg at precision 4 with a `geo_centroid`
    sub-agg: events bucketed by the base-32 geohash of their
    (runtime-field) coordinates, each bucket reporting doc_count and
    the centroid of its points — one grouped pass, bucketing is pure
    per-row bit arithmetic."""
    ev = load_table(spark, "events", sf_dir)
    ix, iy = geohash_cell_exprs("lat", "lon")
    # cast: Spark parses the 45.0/0.1 literals as DECIMAL, DuckDB as
    # DOUBLE — the centroid avg must agree in type
    pts = (ev.select(F.expr(LAT_S).cast("double").alias("lat"),
                     F.expr(LON_S).cast("double").alias("lon"))
           .withColumn("gh", F.expr(geohash_expr(ix, iy))))
    return (pts.groupBy(F.col("gh").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.avg("lat"), 4).alias("centroid_lat"),
                 F.round(F.avg("lon"), 4).alias("centroid_lon"))
            .orderBy(F.desc("doc_count"), F.asc("key")))


def _geohash_oracle() -> str:
    ix, iy = geohash_cell_exprs("lat", "lon")
    return f"""
WITH pts AS (SELECT {LAT_D} AS lat, {LON_D} AS lon FROM events)
SELECT {geohash_expr(ix, iy)} AS key,
       count(*) AS doc_count,
       round(avg(lat), 4) AS centroid_lat,
       round(avg(lon), 4) AS centroid_lon
FROM pts GROUP BY key ORDER BY doc_count DESC, key ASC
"""


QUERIES.update({
    "dsl_query_string": dsl_query_string,
    "dsl_simple_query_string": dsl_simple_query_string,
    "dsl_match_phrase_prefix": dsl_match_phrase_prefix,
    "dsl_dis_max_boosting": dsl_dis_max_boosting,
    "dsl_geohash_grid": dsl_geohash_grid,
})
ORACLES.update({
    "dsl_query_string": DSL_QUERY_STRING_ORACLE,
    "dsl_simple_query_string": DSL_SIMPLE_QUERY_STRING_ORACLE,
    "dsl_match_phrase_prefix": DSL_MATCH_PHRASE_PREFIX_ORACLE,
    "dsl_dis_max_boosting": DSL_DIS_MAX_BOOSTING_ORACLE,
    "dsl_geohash_grid": _geohash_oracle(),
})
