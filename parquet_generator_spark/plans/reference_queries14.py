"""ES-DSL thirteenth tranche: `percolate` (reverse search — match
documents against a REGISTRY of stored queries, the alerting/saved-
search workhorse) and `geo_shape` (polygon containment via the
ray-casting point-in-polygon test as pure arithmetic).

Scale posture: percolation evaluates each stored query as ONE
compiled boolean column over a single scan — Q stored queries = Q
codegen predicates in one projection, then a constant-factor
map-side explode of the matching (doc, query_id) pairs (the
dsl_adjacency_matrix shape); the registry is a query-plan constant,
never a join side. geo_shape is per-row arithmetic: for a convex or
concave simple polygon of V vertices, the crossing test is V codegen
comparisons — pushdown-friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import (
    _B_L,
    _B_R,
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


# ------------------------------------------------------ dsl_percolate

# the stored-query registry: (query_id, DSL dict, oracle SQL pred);
# token-boundary pieces imported from esdsl (single source of truth)


def _tok(t: str) -> str:
    return f"regexp_matches(lower(text), '{_B_L}{t}{_B_R}')"


PERCOLATORS: list[tuple[str, dict, str]] = [
    ("alert_spark_slow",
     {"bool": {"must": [{"match": {"text": "spark"}},
                        {"match": {"text": "slow"}}]}},
     f"({_tok('spark')} AND {_tok('slow')})"),
    ("watch_merge_or_batch",
     {"bool": {"should": [{"match": {"text": "merge"}},
                          {"match": {"text": "batch"}}]}},
     f"({_tok('merge')} OR {_tok('batch')})"),
    ("short_docs",
     {"range": {"n_chars": {"lt": 100}}},
     "(n_chars IS NOT NULL AND n_chars < 100)"),
    ("es_query_bar",
     {"query_string": {"query": "quer* AND NOT slow",
                       "fields": ["text"]}},
     f"(regexp_matches(lower(text), '{_B_L}quer[a-z0-9]*{_B_R}') "
     f"AND NOT {_tok('slow')})"),
]


def dsl_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `percolate`: the registry of stored queries runs against
    every incoming document; output is the per-stored-query match
    count plus the matched-doc id span (the alerting fan-out table).
    Every stored query compiles to one codegen boolean column — a
    single scan evaluates the whole registry, then a constant-factor
    array explode emits (query_id, doc) pairs."""
    from parquet_generator_spark.streaming.percolate import (
        percolate_stream,
    )
    docs = load_table(spark, "documents", sf_dir)
    pairs = percolate_stream(docs, [(qid, q)
                                    for qid, q, _ in PERCOLATORS])
    return (pairs.groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .orderBy("query_id"))


def _percolate_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"SELECT '{qid}' AS query_id, doc_id FROM documents "
        f"WHERE {pred}"
        for qid, _, pred in PERCOLATORS)
    return f"""
WITH pairs AS ({arms})
SELECT query_id, count(*) AS n_matches,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM pairs GROUP BY query_id ORDER BY query_id
"""


# ------------------------------------------------------ dsl_geo_shape

# simple (non-self-intersecting) test polygon over the runtime-field
# coordinate domain (lat 45..54.6, lon 5..25)
POLYGON: list[tuple[float, float]] = [
    (46.0, 7.0), (53.0, 9.0), (52.0, 16.0), (48.5, 14.0), (47.0, 20.0),
    (45.5, 12.0),
]


def _crossing_terms(lat: str, lon: str) -> str:
    """Ray-casting point-in-polygon as a SQL parity expression: cast
    a ray east; the point is inside when it crosses an odd number of
    edges. Each edge contributes one guarded crossing test — V
    comparisons, identical text on both engines."""
    terms = []
    v = POLYGON
    n = len(v)
    for i in range(n):
        y1, x1 = v[i]
        y2, x2 = v[(i + 1) % n]
        # edge straddles the point's latitude (half-open to dodge
        # vertex double-count), and the intersection lies east
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat}) != ({y2!r} > {lat})) AND "
            f"({lon} < {x1!r} + ({x2!r} - {x1!r}) * ({lat} - {y1!r}) "
            f"/ ({y2!r} - {y1!r})) THEN 1 ELSE 0 END)")
    return "(" + " + ".join(terms) + ") % 2 = 1"


def dsl_geo_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geo_shape` intersects-with-polygon query: users whose point
    falls inside a 6-vertex simple polygon, by the ray-casting
    crossing test — V guarded comparisons per row, no UDF, the same
    expression text on both engines; faceted by event_type."""
    ev = load_table(spark, "events", sf_dir)
    pts = ev.select("event_type",
                    F.expr(LAT_S).cast("double").alias("lat"),
                    F.expr(LON_S).cast("double").alias("lon"))
    inside = F.expr(_crossing_terms("lat", "lon"))
    return (pts.filter(inside)
            .groupBy(F.col("event_type").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy(F.desc("doc_count"), F.asc("key")))


def _geo_shape_oracle() -> str:
    return f"""
WITH pts AS (
  SELECT event_type, CAST({LAT_D} AS DOUBLE) AS lat,
         CAST({LON_D} AS DOUBLE) AS lon
  FROM events)
SELECT event_type AS key, count(*) AS doc_count
FROM pts
WHERE {_crossing_terms("lat", "lon")}
GROUP BY key ORDER BY doc_count DESC, key ASC
"""


# ------------------------------------------------------- dsl_wrapper

# the base64 payload a client would ship: {"term": {"event_type":
# "purchase"}} — built at import so the test of record is the decode
import base64 as _b64
import json as _json

WRAPPED = _b64.b64encode(_json.dumps(
    {"term": {"event_type": "purchase"}}).encode()).decode()


def dsl_wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES `wrapper` query: a base64-encoded JSON query decoded and
    translated at plan time (clients use it to smuggle queries
    through tooling that mangles JSON). Decoding happens on the
    driver before translation — zero runtime cost; the inner query
    here pushes to the scan like any term filter."""
    ev = load_table(spark, "events", sf_dir)
    return (ev.filter(translate_query({"wrapper": {"query": WRAPPED}}))
            .groupBy(F.col("event_type").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .orderBy("key"))


DSL_WRAPPER_ORACLE = """
SELECT event_type AS key, count(*) AS doc_count,
       round(CAST(sum(value) AS DOUBLE), 2) AS sum_value
FROM events WHERE event_type = 'purchase'
GROUP BY key ORDER BY key
"""


QUERIES.update({
    "dsl_percolate": dsl_percolate,
    "dsl_geo_shape": dsl_geo_shape,
    "dsl_wrapper": dsl_wrapper,
})
ORACLES.update({
    "dsl_percolate": _percolate_oracle(),
    "dsl_geo_shape": _geo_shape_oracle(),
    "dsl_wrapper": DSL_WRAPPER_ORACLE,
})
