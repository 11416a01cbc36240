"""Round-12 reference tranche: ES|QL TSDS ``RATE()``.

``esql_rate`` — the Kibana TSDS metrics panel shape (ES 8.14+):
``STATS <outer>(RATE(counter)) BY BUCKET(@timestamp, 1 day)`` over a
counter field, with the reset-reconstruction rule already owned by
``dsl_counter_rate`` (plans/reference_queries23.py): a counter only
climbs, so a negative delta means the emitting process reset and the
true increase is the current value. The translator
(operators/esql.py) renders the two-level TSDS aggregation — per
(series, bucket): lag window -> reset-adjusted increase over the
bucket's observed epoch-microsecond span = per-series per-second
rate; then the outer SUM/AVG/MAX combines rates across series. The
series identity is passed as ``parse_esql(..., tsds=...)``, the
analog of the TSDS index's ``_tsid``/``@timestamp`` mapping
(reference parity anchor: the reference ETL pulls from time-indexed
ES sources — Bootstrap.java:87-130 — where TSDS rate is the standard
downstream panel).

Scale: the lag window and the level-1 groupBy share ONE shuffle on
the series key (exactly the _tsid routing a TSDS index performs at
write); level 2 operates on series-cardinality rows, and the final
relation is bucket-cardinality. No self-join, no driver state.

The counter source is the same synthetic modulo-1000 cumulative
counter dsl_counter_rate uses, so resets occur organically and
identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esql import (
    esql_df,
    esql_duck_sql,
    parse_esql,
)
from parquet_generator_spark.plans.reference_queries23 import _CTR_MOD
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_TSDS = ("user_id", "ts", "event_id")

# the ES|QL 8.16 TS command heads the pipeline (FROM's time-series
# sibling — it requires the tsds identity at parse)
ESQL_RATE_QUERY = """
TS ctr_events
| STATS rate_sum = SUM(RATE(ctr)), rate_avg = AVG(RATE(ctr)),
        rate_max = MAX(RATE(ctr)) BY day = BUCKET(ts, 1 day)
| EVAL rate_sum = ROUND(rate_sum, 6), rate_avg = ROUND(rate_avg, 6),
       rate_max = ROUND(rate_max, 6)
| SORT day
"""


def _ctr_source(ev: DataFrame) -> DataFrame:
    """The dsl_counter_rate synthetic counter: per-user cumulative
    sum of a deterministic per-event weight, wrapped modulo 1000 so
    resets occur organically."""
    w_cum = (Window.partitionBy("user_id")
             .orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, 0))
    return ev.select(
        "user_id", "ts", "event_id",
        (F.sum(F.col("event_id") % 5 + 1).over(w_cum) % _CTR_MOD)
        .alias("ctr"))


def esql_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    plan = parse_esql(ESQL_RATE_QUERY, tsds=_TSDS)
    ev = load_table(spark, "events", sf_dir)
    return esql_df(_ctr_source(ev), plan)


def _esql_rate_oracle() -> str:
    ctr = (f"WITH ctr_events AS ("
           f"SELECT user_id, ts, event_id, "
           f"sum(event_id % 5 + 1) OVER ("
           f"PARTITION BY user_id ORDER BY ts, event_id "
           f"ROWS UNBOUNDED PRECEDING) % {_CTR_MOD} AS ctr "
           f"FROM events) ")
    return ctr + esql_duck_sql(parse_esql(ESQL_RATE_QUERY,
                                          tsds=_TSDS))


QUERIES.update({"esql_rate": esql_rate})
ORACLES.update({"esql_rate": _esql_rate_oracle()})


# ------------------------------------------------------ esql_knn

# the dsl_knn literal query (reference_queries15), so the ES|QL and
# Query-DSL vector paths are directly comparable
ESQL_KNN_K = 12


def _esql_knn_query() -> str:
    from parquet_generator_spark.plans.reference_queries15 import (
        KNN_QV,
    )

    vec = ", ".join(repr(v) for v in KNN_QV)
    return (f"FROM embeddings "
            f"| WHERE label >= 3 "
            f"| WHERE KNN(embedding, [{vec}], {ESQL_KNN_K}) "
            f"| KEEP vec_id, label, _score "
            f"| SORT _score DESC, vec_id")


def esql_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``KNN`` (ES 8.19 preview): filtered vector search in
    the pipeline grammar — the preceding WHERE is the ES pre-filter
    (every hit satisfies it), the KNN keeps the top k by the
    dense_vector cosine score (1+cos)/2 with the vec_id tiebreak,
    and ``_score`` rides into KEEP/SORT (the METADATA _score
    convention). Plan: pushed label filter -> one narrow scoring
    map -> TakeOrderedAndProject; no join, no corpus broadcast."""
    plan = parse_esql(_esql_knn_query(), knn_key="vec_id")
    emb = load_table(spark, "embeddings", sf_dir)
    return esql_df(emb, plan)


QUERIES.update({"esql_knn": esql_knn})
ORACLES.update({
    "esql_knn": esql_duck_sql(parse_esql(_esql_knn_query(),
                                         knn_key="vec_id")),
})


# ----------------------------------------------------- esql_fuse

def _esql_fuse_query() -> str:
    from parquet_generator_spark.plans.reference_queries15 import (
        KNN_QV,
    )

    vec = ", ".join(repr(v) for v in KNN_QV)
    return (
        "FROM embeddings | FORK "
        f"(WHERE KNN(embedding, [{vec}], 20) "
        "| SORT _score DESC, vec_id | LIMIT 20) "
        "(WHERE label >= 5 | EVAL s = vec_id % 97 "
        "| SORT s DESC, vec_id | LIMIT 20) "
        "| FUSE vec_id "
        "| SORT _score DESC, vec_id | LIMIT 25")


def esql_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL hybrid retrieval (ES 8.19 ``FORK ... | FUSE``): a
    vector branch (KNN top-20 by the dense_vector cosine score) and
    a metadata/lexical-style branch, fused by reciprocal-rank fusion
    with the ES default rank_constant 60 on the doc identity. Each
    branch's rank comes from its own final SORT|LIMIT (the bounded
    rerank-window contract); the fusion is one grouped pass over at
    most branches x window rows. The shared input scan is
    checkpointed once (the FORK posture)."""
    plan = parse_esql(_esql_fuse_query(), knn_key="vec_id")
    emb = load_table(spark, "embeddings", sf_dir)
    return esql_df(emb, plan)


QUERIES.update({"esql_fuse": esql_fuse})
ORACLES.update({
    "esql_fuse": esql_duck_sql(parse_esql(_esql_fuse_query(),
                                          knn_key="vec_id")),
})
