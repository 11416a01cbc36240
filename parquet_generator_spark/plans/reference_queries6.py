"""ES `nested` query and `nested` aggregation over an
array-of-structs field — the most common real-ES construct the DSL
surface lacked (the reference's own office365_signin data is 45 flat
fields, which is why this lands after the flat surface).

The raw tables carry no array-of-structs column, so the queries first
MATERIALIZE the nested document shape ES would store: one parent per
(user, day) with an ``items`` array of {event_type, value} structs —
the order-to-lineitems denormalization every nested mapping encodes.

Scale posture: the nested QUERY is an ``exists(items, x -> pred)``
array-side lambda — no explode, no shuffle, parent cardinality
untouched (at 100 TB the nested docs are the stored table and this is
a pure scan + filter). The nested AGG explodes only the parents the
query kept, then one grouped pass; the carrier construction itself is
one groupBy(user, day) shuffle that exists only because the testdata
is flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import search
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# any element is a purchase of value >= 90 — both conditions must hold
# on the SAME element (the defining nested-vs-flat distinction: a doc
# with a cheap purchase and an expensive click must NOT match)
NESTED_Q = {"nested": {"path": "items", "query": {"bool": {
    "must": [{"term": {"items.event_type": "purchase"}},
             {"range": {"items.value": {"gte": 90.0}}}]}}}}


def _nested_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (ev.groupBy("user_id", F.to_date("ts").alias("day"))
            .agg(F.collect_list(F.struct("event_type", "value"))
                 .alias("items"),
                 F.count(F.lit(1)).alias("n_items")))


def dsl_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`nested` query: parents with >= 1 array element satisfying the
    inner bool (term + range on the same element). Translated to an
    exists() higher-order function by esdsl._element_pred_sql."""
    parents = _nested_parents(spark, sf_dir)
    return (search(parents, {"query": NESTED_Q})
            .select("user_id", "day", "n_items")
            .orderBy("user_id", "day"))


DSL_NESTED_ORACLE = """
SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_items
FROM events
GROUP BY 1, 2
HAVING bool_or(event_type = 'purchase' AND value >= 90.0)
ORDER BY user_id, day
"""


def dsl_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`nested` agg under the nested query: explode the kept parents'
    ``items`` (explode-on-demand — only after the parent filter) and
    run the ES terms + avg sub-agg shape over the elements."""
    parents = search(_nested_parents(spark, sf_dir),
                     {"query": NESTED_Q})
    ex = parents.select(F.explode("items").alias("it"))
    return (ex.groupBy(F.col("it.event_type").alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.avg("it.value"), 2).alias("avg_value"))
            .orderBy(F.desc("doc_count"), F.asc("key")))


DSL_NESTED_AGG_ORACLE = """
WITH p AS (
  SELECT user_id, CAST(ts AS DATE) AS day
  FROM events GROUP BY 1, 2
  HAVING bool_or(event_type = 'purchase' AND value >= 90.0))
SELECT e.event_type AS key, count(*) AS doc_count,
       round(avg(e.value), 2) AS avg_value
FROM events e JOIN p ON e.user_id = p.user_id
                    AND CAST(e.ts AS DATE) = p.day
GROUP BY 1 ORDER BY doc_count DESC, key ASC
"""

QUERIES.update({
    "dsl_nested": dsl_nested,
    "dsl_nested_agg": dsl_nested_agg,
})
ORACLES.update({
    "dsl_nested": DSL_NESTED_ORACLE,
    "dsl_nested_agg": DSL_NESTED_AGG_ORACLE,
})
