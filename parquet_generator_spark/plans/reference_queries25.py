"""ES|QL tranche two: the time-series panel shape, multivalue
expansion, and structured-log DISSECT — the three highest-frequency
real ES|QL pipelines the round-10 subset still refused.

All three ride the round-11 esql.py rework: commands are an ORDERED
list applied sequentially by both renderers (no hoisting — `SORT |
LIMIT | WHERE` filters the top-n), CONCAT renders NULL-propagating
in both engines, and a KEEP that drops a sort column projects it
through the oracle's LIMIT subquery.

Reference parity: ES|QL per the public ES 8.11+ grammar (the
reference repo's surface is an ETL tool with no query language; the
translation generalizes what its ES indices get queried WITH).

Scale notes:
- esql_pipeline_ts: the NOW() anchor resolves at PLAN time to a
  timestamp literal (plan_clock), so the range filter reaches the
  parquet scan (PushedFilters) and row-group pruning holds at any
  corpus size; the aggregation is one hash-agg keyed on
  date_trunc — partial map-side combine, no wide rows.
- esql_mv_expand: explode is a narrow map (no shuffle); the only
  shuffle is the token groupBy, and the top-k is
  TakeOrderedAndProject, never a full sort.
- esql_dissect: regexp_extract is pure codegen on the scanned
  column; the groupBy key is a small int — bounded agg state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_generator_spark.operators.esdsl import plan_clock
from parquet_generator_spark.operators.esql import (
    esql_df,
    esql_duck_sql,
    parse_esql,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

# same injected plan-time instant the dsl_date_math_now tranche
# uses: mid-day inside the events range, so the trailing-14-day
# window has both full days and a partial boundary day
NOW_ANCHOR = "2024-01-22 09:30:00"

ESQL_TS_QUERY = """
FROM events
| WHERE ts >= NOW() - 14 day AND value >= 1
| STATS n = COUNT(*), users = COUNT_DISTINCT(user_id),
        mx = MAX(value) BY day = BUCKET(ts, 1 day)
| WHERE n >= 5
| SORT day
| LIMIT 100
"""

ESQL_MV_QUERY = """
FROM documents
| EVAL toks = SPLIT(text, " ")
| MV_EXPAND toks
| WHERE LENGTH(toks) >= 3
| STATS n = COUNT(*), docs = COUNT_DISTINCT(doc_id) BY toks
| SORT n DESC, toks
| LIMIT 30
"""

# events.props is the driver's structured-log column: '{"k": <int>}'
ESQL_DISSECT_QUERY = (
    'FROM events '
    '| DISSECT props "{\\"k\\": %{kv}}" '
    '| EVAL k = TO_LONG(kv) '
    '| STATS n = COUNT(*), mxk = MAX(k) BY b = k % 10 '
    '| SORT b')


def esql_pipeline_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The default Kibana ES|QL panel: NOW()-relative range filter +
    STATS ... BY BUCKET(ts, 1 day) + a post-aggregation WHERE
    (sequential semantics — it filters the aggregated relation).
    NOW() resolves under the injected plan clock to a literal that
    reaches the parquet scan."""
    with plan_clock(NOW_ANCHOR):
        plan = parse_esql(ESQL_TS_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


def esql_mv_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT + MV_EXPAND + grouped count: the ES|QL token-frequency
    pipeline (explode == unnest in both engines; empty/NULL arrays
    drop, per the documented divergence note)."""
    plan = parse_esql(ESQL_MV_QUERY)
    docs = load_table(spark, plan.table, sf_dir)
    return esql_df(docs, plan)


def esql_dissect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISSECT over the structured-log props column -> typed EVAL ->
    grouped stats: the log-pipeline staple. The %{key} pattern
    compiles to ONE anchored regex valid in both Java regex and
    DuckDB's RE2; extraction is regexp_extract codegen on the
    scanned column."""
    plan = parse_esql(ESQL_DISSECT_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


def _ts_oracle() -> str:
    with plan_clock(NOW_ANCHOR):
        return esql_duck_sql(parse_esql(ESQL_TS_QUERY))


QUERIES.update({
    "esql_pipeline_ts": esql_pipeline_ts,
    "esql_mv_expand": esql_mv_expand,
    "esql_dissect": esql_dissect,
})
ORACLES.update({
    "esql_pipeline_ts": _ts_oracle(),
    "esql_mv_expand": esql_duck_sql(parse_esql(ESQL_MV_QUERY)),
    "esql_dissect": esql_duck_sql(parse_esql(ESQL_DISSECT_QUERY)),
})


# ------------------------- snowball language analyzers (de / fr)

# the synthetic corpus is ASCII English, so de/fr documents get
# deterministic planted payloads (literal constants shared by plan
# and oracle — the text_tokens_cjk posture): inflected forms the
# english chain provably cannot fold onto the query's terms
_DE_SNIPPETS = [
    "die häuser wurden gebaut",
    "kategorien für häusern geordnet",
    "schönheit alter häuser",
]
_DE_QUERY = "haus kategorie"

_FR_SNIPPETS = [
    "les maisons nationales sont grandes",
    "arrangements nationaux et continuité",
    "qualification nationale première",
]
_FR_QUERY = "national arrangement"


def _planted_expr(lang: str, snippets: list[str]) -> str:
    snip = ("CASE CAST(doc_id % 3 AS INT) "
            + " ".join(f"WHEN {i} THEN '{s}'"
                       for i, s in enumerate(snippets))
            + " END")
    return (f"CASE WHEN lang = '{lang}' THEN "
            f"concat({snip}, ' ', substr(text, 1, 60)) "
            f"ELSE substr(text, 1, 60) END")


def _match_lang_df(spark: SparkSession, sf_dir: str, lang: str,
                   snippets: list[str], query: str,
                   analyzer_name: str) -> DataFrame:
    """Since round 13: served from the INGEST-TIME analyzed store
    (plans/analyzed_store.py) — the query side is stemmed at plan
    time and the field side is a stored-array membership scan, zero
    stemmer expressions in the query plan (the ES index-time
    contract; VERDICT r12 mandate #1). The ORACLE still recomputes
    the full analysis from raw text in DuckDB, so the driver proves
    stored == query-time every round."""
    from pyspark.sql import functions as F

    from parquet_generator_spark.operators.analyzers import (
        get_analyzer,
        stored_match,
    )
    from parquet_generator_spark.plans.analyzed_store import (
        load_store,
    )

    pred = stored_match(f"analyzed_{lang}", query,
                        get_analyzer(analyzer_name), operator="and")
    return (load_store(spark, sf_dir)
            .filter(pred)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy("source"))


def _match_lang_oracle(lang: str, snippets: list[str], query: str,
                       analyzer_name: str) -> str:
    from parquet_generator_spark.operators.analyzers import (
        analyzed_match_duck_sql,
        get_analyzer,
    )

    pred = analyzed_match_duck_sql(
        "mixed", query, get_analyzer(analyzer_name), operator="and")
    return f"""
WITH m AS (SELECT source,
                  {_planted_expr(lang, snippets)} AS mixed
           FROM documents)
SELECT source, count(*) AS doc_count
FROM m WHERE {pred}
GROUP BY source ORDER BY source
"""


def dsl_match_analyzer_de(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """``match`` with ``analyzer: "german"`` (snowball german,
    operator AND): the query's dictionary forms (haus, kategorie)
    match the planted declensions (häusern, kategorien) only through
    the full stemmer chain — umlaut-aware tokenization, R1/R2 suffix
    removal, umlaut folding. The english chain provably matches ZERO
    documents here (pinned in tests/test_snowball_de.py's sibling
    analyzer test): ä splits its tokenizer and the S-stemmer cannot
    fold häusern -> haus. Stemmer bound ONCE per document
    (operators/analyzers._stemmed_match_sql)."""
    return _match_lang_df(spark, sf_dir, "de", _DE_SNIPPETS,
                          _DE_QUERY, "german")


def dsl_match_analyzer_fr(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """``match`` with ``analyzer: "french"`` (snowball french,
    operator AND): nationaux/nationales/arrangements all fold to the
    query's stems through RV/R1/R2 suffix removal + residual steps —
    the english chain matches zero."""
    return _match_lang_df(spark, sf_dir, "fr", _FR_SNIPPETS,
                          _FR_QUERY, "french")


QUERIES.update({
    "dsl_match_analyzer_de": dsl_match_analyzer_de,
    "dsl_match_analyzer_fr": dsl_match_analyzer_fr,
})
ORACLES.update({
    "dsl_match_analyzer_de": _match_lang_oracle(
        "de", _DE_SNIPPETS, _DE_QUERY, "german"),
    "dsl_match_analyzer_fr": _match_lang_oracle(
        "fr", _FR_SNIPPETS, _FR_QUERY, "french"),
})


# -------------------------------------- dsl_scripted_metric_loop

def dsl_scripted_metric_loop(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """``scripted_metric`` whose map_script is a bounded painless
    ``for`` loop over a doc ARRAY field — the remaining real-world
    scripted_metric shape the fold gate refused (VERDICT r10 #8).
    The loop bound is the array's own length, so it translates to
    ONE higher-order aggregate() fold per document (codegen, no
    unroll, no UDF); the per-doc value then rides the same partial
    aggregate as every other fold. Values quantized inside the loop
    (Math.floor(x*x*1000)) so the cross-row sum is an exact
    integer-valued double on both engines; the per-element CAST to
    DOUBLE pins float[] arithmetic to one promotion rule."""
    from parquet_generator_spark.operators.esdsl import search

    emb = load_table(spark, "embeddings", sf_dir)
    return search(emb, {
        "aggs": {"labels": {
            "terms": {"field": "label", "size": 20},
            "aggs": {"sq_millis": {"scripted_metric": {
                "init_script": "state.v = 0",
                "map_script":
                    "for (int i = 0; i < doc['embedding'].length; "
                    "i++) { state.v += Math.floor("
                    "doc['embedding'][i] * doc['embedding'][i] "
                    "* 1000) }",
                "combine_script":
                    "long p = 0; for (t in state.v) { p += t }"
                    " return p",
                "reduce_script":
                    "long p = 0; for (a in states) { p += a }"
                    " return p"}}},
        }},
    })


_SCRIPTED_LOOP_ORACLE = """
WITH t AS (
  SELECT label,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(embedding,
               x -> floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                          * 1000))),
           (acc, x) -> acc + x) AS v
  FROM embeddings)
SELECT label AS key, CAST(count(*) AS BIGINT) AS doc_count,
       sum(v) AS sq_millis
FROM t GROUP BY label
ORDER BY doc_count DESC, key ASC LIMIT 20
"""

QUERIES.update({"dsl_scripted_metric_loop": dsl_scripted_metric_loop})
ORACLES.update({"dsl_scripted_metric_loop": _SCRIPTED_LOOP_ORACLE})


# ------------------------------- dsl_match_phrase_analyzer_de

_DE_PHRASE = "hauses geordnetes"


def dsl_match_phrase_analyzer_de(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """``match_phrase`` with ``analyzer: "german"``: the query's
    forms (hauses, geordnetes) and the planted declensions (häusern,
    geordnet) meet only at the snowball stems [haus, geordnet], and
    the two stems must be CONSECUTIVE field positions. Since round
    13 the adjacency windows scan the PERSISTED stemmed positions
    from the central analyzed store — zero stemmer expressions in
    the query plan; the oracle still recomputes from raw text."""
    from pyspark.sql import functions as F

    from parquet_generator_spark.operators.analyzers import (
        get_analyzer,
        stored_match_phrase,
    )
    from parquet_generator_spark.plans.analyzed_store import (
        load_store,
    )

    pred = stored_match_phrase("analyzed_de", _DE_PHRASE,
                               get_analyzer("german"))
    return (load_store(spark, sf_dir)
            .filter(pred)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy("lang"))


def _phrase_de_oracle() -> str:
    from parquet_generator_spark.operators.analyzers import (
        analyzed_match_phrase_duck_sql,
        get_analyzer,
    )

    pred = analyzed_match_phrase_duck_sql(
        "mixed", _DE_PHRASE, get_analyzer("german"))
    return f"""
WITH m AS (SELECT lang,
                  {_planted_expr("de", _DE_SNIPPETS)} AS mixed
           FROM documents)
SELECT lang, count(*) AS doc_count
FROM m WHERE {pred}
GROUP BY lang ORDER BY lang
"""


QUERIES.update(
    {"dsl_match_phrase_analyzer_de": dsl_match_phrase_analyzer_de})
ORACLES.update(
    {"dsl_match_phrase_analyzer_de": _phrase_de_oracle()})


# ------------------------------------------------ esql_rename_drop

ESQL_RENAME_QUERY = (
    "FROM events "
    "| RENAME event_type AS etype, value AS v "
    '| WHERE STARTS_WITH(etype, "pu") AND v >= 50 '
    "| EVAL bucket = TO_LONG(FLOOR(v)) % 5, "
    'tag = COALESCE(etype, "none") '
    "| DROP props "
    "| STATS n = COUNT(*), hi = MAX(v) BY tag, bucket "
    "| SORT tag, bucket")


def esql_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL projection-management commands: RENAME (sequential —
    a renamed sort column keeps feeding later LIMITs under its new
    name), DROP (refused at parse time if it would remove an active
    sort column), plus the string/scalar function tranche
    (STARTS_WITH/ENDS_WITH per-engine, COALESCE/TRIM/SUBSTRING/
    FLOOR engine-neutral). FLOOR before TO_LONG keeps the
    double->BIGINT cast integer-exact in both engines (DuckDB
    rounds, Spark truncates — floor makes them agree)."""
    plan = parse_esql(ESQL_RENAME_QUERY)
    ev = load_table(spark, plan.table, sf_dir)
    return esql_df(ev, plan)


QUERIES.update({"esql_rename_drop": esql_rename_drop})
ORACLES.update({
    "esql_rename_drop": esql_duck_sql(parse_esql(ESQL_RENAME_QUERY)),
})


# ---------------------------------------- dsl_match_analyzer_es

_ES_SNIPPETS = [
    "las canciones fueron grabadas",
    "trabajadores cantando canciones",
    "la comunicación llegó rápidamente",
]
_ES_QUERY = "cancion trabajador"


def dsl_match_analyzer_es(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """``match`` with ``analyzer: "spanish"`` (snowball spanish,
    operator AND): the query's dictionary forms (cancion,
    trabajador) reach the planted inflections (canciones,
    trabajadores) only through the full stemmer — accent-aware
    tokenization, RV/R1/R2 suffix system, pronoun step, accent
    folding. The english chain matches zero of the same documents
    (canciones S-stems to cancione, never cancion)."""
    return _match_lang_df(spark, sf_dir, "es", _ES_SNIPPETS,
                          _ES_QUERY, "spanish")


QUERIES.update({"dsl_match_analyzer_es": dsl_match_analyzer_es})
ORACLES.update({"dsl_match_analyzer_es": _match_lang_oracle(
    "es", _ES_SNIPPETS, _ES_QUERY, "spanish")})
