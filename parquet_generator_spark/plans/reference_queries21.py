"""ES-DSL twenty-first tranche: learned and composed ranking.

- ``dsl_ltr_rescore`` — the Learning-to-Rank rescorer (ES 8.12):
  phase 1 retrieves a bounded window by query score, phase 2
  re-scores ONLY that window with a trained model over extracted
  features. The model here is a literal linear scorer (the shape a
  distilled LTR model has after export); feature extraction is the
  real contract — per-doc features computed inside the window
  projection, never corpus-wide.
- ``dsl_retriever_pipeline`` — the ES 8.14+ retriever TREE: an
  `rrf` retriever (lexical + vector legs) nested under a `rescorer`
  retriever (phrase-boost re-rank of the fused window). Composition
  is the point: each stage consumes the previous stage's bounded
  frame, so the whole pipeline touches window-size rows after the
  two leg scans.

Scale posture: every stage is TakeOrderedAndProject over one scan or
over a previous bounded frame; joins are <= window-size full-outers
(AQE broadcasts); no global sort anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import (
    score_query,
    token_present_duck_sql,
    translate_query,
)
from parquet_generator_spark.operators.similarity import (
    cosine_to_literal,
    cosine_to_literal_duck_sql,
)
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


_tok_duck = token_present_duck_sql


# ------------------------------------------------------ dsl_ltr_rescore

_LTR_Q = {"dis_max": {"queries": [
    {"match": {"text": {"query": "scan", "boost": 2.0}}},
    {"match": {"text": {"query": "sort", "boost": 1.5}}},
    {"match": {"text": {"query": "line", "boost": 1.0}}},
], "tie_breaker": 0.3}}
_LTR_WINDOW = 40
_LTR_K = 10
# exported linear model: [w_query_score, w_token_count, w_is_en], bias
_LTR_W = [0.8, -0.002, 1.2]
_LTR_BIAS = 0.1


def dsl_ltr_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTR rescorer: phase-1 dis_max window (TakeOrdered 40), then a
    literal linear model over three features extracted IN the window
    projection — the phase-1 score, the token count (length prior),
    and a language indicator. Emits features beside the model score
    (the explain-your-ranking contract LTR tooling expects)."""
    docs = load_table(spark, "documents", sf_dir)
    win = (docs.filter(translate_query(_LTR_Q))
           .select("doc_id", "lang", "text",
                   F.round(score_query(_LTR_Q), 4).alias("f_score"))
           .orderBy(F.desc("f_score"), F.asc("doc_id"))
           .limit(_LTR_WINDOW))
    f_len = F.size(F.split(F.col("text"), " "))
    f_en = F.when(F.col("lang") == "en", 1.0).otherwise(0.0)
    model = (F.lit(_LTR_W[0]) * F.col("f_score")
             + F.lit(_LTR_W[1]) * F.col("f_len")
             + F.lit(_LTR_W[2]) * F.col("f_en") + F.lit(_LTR_BIAS))
    scored = (win.withColumn("f_len", f_len)
              .withColumn("f_en", f_en)
              .select("doc_id", "f_score", "f_len", "f_en",
                      F.round(model, 4).alias("ltr_score")))
    top = (scored.orderBy(F.desc("ltr_score"), F.asc("doc_id"))
           .limit(_LTR_K))
    w = Window.orderBy(F.desc("ltr_score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "doc_id", "f_score", "f_len", "f_en",
                    "ltr_score").orderBy("rank"))


def _ltr_oracle() -> str:
    def hit(t: str, w: float) -> str:
        return (f"{w!r} * (CASE WHEN {_tok_duck('text', t)} "
                f"THEN 1 ELSE 0 END)")

    s1, s2, s3 = hit("scan", 2.0), hit("sort", 1.5), hit("line", 1.0)
    return f"""
WITH win AS (
  SELECT doc_id, lang, text,
         round(greatest({s1}, {s2}, {s3})
               + 0.3 * ({s1} + {s2} + {s3}
                        - greatest({s1}, {s2}, {s3})), 4) AS f_score
  FROM documents
  WHERE {_tok_duck('text', 'scan')} OR {_tok_duck('text', 'sort')}
     OR {_tok_duck('text', 'line')}
  ORDER BY f_score DESC, doc_id ASC LIMIT {_LTR_WINDOW}),
feat AS (
  SELECT doc_id, f_score,
         CAST(len(string_split(text, ' ')) AS INT) AS f_len,
         CAST(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END
              AS DOUBLE) AS f_en
  FROM win),
scored AS (
  SELECT doc_id, f_score, f_len, f_en,
         round({_LTR_W[0]!r} * f_score + {_LTR_W[1]!r} * f_len
               + {_LTR_W[2]!r} * f_en + {_LTR_BIAS!r}, 4)
           AS ltr_score
  FROM feat)
SELECT CAST(row_number() OVER (ORDER BY ltr_score DESC, doc_id)
            AS INT) AS rank,
       doc_id, f_score, f_len, f_en, ltr_score
FROM scored ORDER BY ltr_score DESC, doc_id LIMIT {_LTR_K}
"""


# ------------------------------------------------ dsl_retriever_pipeline

_RP_TEXT_Q = {"dis_max": {"queries": [
    {"match": {"text": {"query": "merge", "boost": 2.0}}},
    {"match": {"text": {"query": "batch", "boost": 1.0}}},
], "tie_breaker": 0.2}}
_RP_QV = [round(math.sin(0.51 * i + 0.9), 4) for i in range(64)]
_RP_WINDOW = 30     # rrf rank_window_size
_RP_CONST = 60
_RP_RESCORE_WINDOW = 12
_RP_K = 8
_RP_QW, _RP_RQW = 50.0, 1.0   # rescore weights over the rrf score
_RP_PHRASE_BOOST = 3.0


def dsl_retriever_pipeline(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Retriever tree: rescorer( rrf( standard(dis_max),
    knn(literal vector) ) ). The rrf stage fuses two bounded
    TakeOrdered legs by reciprocal rank; the rescorer re-ranks the
    fused top-12 with a phrase query (50*rrf + 3.0*phrase_hit).
    After the two corpus scans, every stage operates on <= 30 rows."""
    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    t_top = (docs.filter(translate_query(_RP_TEXT_Q))
             .select("doc_id",
                     F.round(score_query(_RP_TEXT_Q), 4).alias("s"))
             .orderBy(F.desc("s"), F.asc("doc_id"))
             .limit(_RP_WINDOW))
    tw = Window.orderBy(F.desc("s"), F.asc("doc_id"))
    t_rank = (t_top.withColumn("tr", F.row_number().over(tw))
              .select(F.col("doc_id").alias("id"), "tr"))

    cos = cosine_to_literal("embedding", _RP_QV)
    v_top = (emb.select(F.col("vec_id").alias("id"), cos.alias("c"))
             .orderBy(F.desc("c"), F.asc("id")).limit(_RP_WINDOW))
    vw = Window.orderBy(F.desc("c"), F.asc("id"))
    v_rank = (v_top.withColumn("vr", F.row_number().over(vw))
              .select("id", "vr"))

    rrf = F.round(
        F.coalesce(1.0 / (F.lit(_RP_CONST) + F.col("tr")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(_RP_CONST) + F.col("vr")),
                     F.lit(0.0)), 6)
    fused = (t_rank.join(v_rank, "id", "full_outer")
             .select("id", rrf.alias("rrf_score"))
             .orderBy(F.desc("rrf_score"), F.asc("id"))
             .limit(_RP_RESCORE_WINDOW))

    # rescorer stage: re-join the bounded fused frame to the doc
    # text (window-size semi-bounded equi-join) for the phrase test
    phrase = translate_query(
        {"match_phrase": {"text": "merge batch"}})
    rescored = (fused.join(docs.select("doc_id", "text"),
                           fused.id == F.col("doc_id"), "left")
                .select("id", "rrf_score",
                        F.when(phrase, F.lit(_RP_PHRASE_BOOST))
                        .otherwise(F.lit(0.0)).alias("r")))
    # UNROUNDED final: 50 x a 6-decimal rrf lands exactly on .x5
    # boundaries where Spark (HALF_UP) and DuckDB disagree; both
    # engines compute the identical double from identical inputs, so
    # emitting it raw is the exact-parity choice (%.6g compare)
    final = (F.lit(_RP_QW) * F.col("rrf_score")
             + F.lit(_RP_RQW) * F.col("r"))
    top = (rescored.select("id", final.alias("score"))
           .orderBy(F.desc("score"), F.asc("id")).limit(_RP_K))
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", "id", "score").orderBy("rank"))


def _retriever_pipeline_oracle() -> str:
    from parquet_generator_spark.operators.esdsl import phrase_regex

    def hit(t: str, w: float) -> str:
        return (f"{w!r} * (CASE WHEN {_tok_duck('text', t)} "
                f"THEN 1 ELSE 0 END)")

    s1, s2 = hit("merge", 2.0), hit("batch", 1.0)
    cos_sql = cosine_to_literal_duck_sql(
        "CAST(embedding AS DOUBLE[])", _RP_QV)
    ph = phrase_regex("merge batch")
    return f"""
WITH t_top AS (
  SELECT doc_id AS id,
         round(greatest({s1}, {s2})
               + 0.2 * ({s1} + {s2} - greatest({s1}, {s2})), 4) AS s
  FROM documents
  WHERE {_tok_duck('text', 'merge')} OR {_tok_duck('text', 'batch')}
  ORDER BY s DESC, id ASC LIMIT {_RP_WINDOW}),
t_rank AS (
  SELECT id, CAST(row_number() OVER (ORDER BY s DESC, id) AS INT)
           AS tr FROM t_top),
v_top AS (
  SELECT vec_id AS id, {cos_sql} AS c
  FROM embeddings ORDER BY c DESC, id ASC LIMIT {_RP_WINDOW}),
v_rank AS (
  SELECT id, CAST(row_number() OVER (ORDER BY c DESC, id) AS INT)
           AS vr FROM v_top),
fused AS (
  SELECT coalesce(t_rank.id, v_rank.id) AS id,
         round(coalesce(1.0 / ({_RP_CONST} + tr), 0.0)
               + coalesce(1.0 / ({_RP_CONST} + vr), 0.0), 6)
           AS rrf_score
  FROM t_rank FULL OUTER JOIN v_rank ON t_rank.id = v_rank.id
  ORDER BY rrf_score DESC, id ASC LIMIT {_RP_RESCORE_WINDOW}),
rescored AS (
  SELECT fused.id, rrf_score,
         CASE WHEN regexp_matches(lower(d.text), '{ph}')
              THEN {_RP_PHRASE_BOOST!r} ELSE 0.0 END AS r
  FROM fused LEFT JOIN documents d ON fused.id = d.doc_id),
final AS (
  SELECT id, {_RP_QW!r} * rrf_score + {_RP_RQW!r} * r AS score
  FROM rescored)
SELECT CAST(row_number() OVER (ORDER BY score DESC, id) AS INT)
         AS rank,
       id, score
FROM final ORDER BY score DESC, id LIMIT {_RP_K}
"""


# ----------------------------------------------------- dsl_explain_score

_EXPLAIN_DOC = 42
_EXPLAIN_CLAUSES = [("spark", 2.0), ("window", 1.5), ("merge", 1.0)]
_EXPLAIN_TB = 0.3


def dsl_explain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES `_explain` API: for ONE document and a dis_max query,
    emit the per-clause score breakdown (matched flag + weighted
    contribution) plus a TOTAL row carrying the tie-breaker
    combination — the relevance-debugging contract. The doc filter
    pushes to the scan (point lookup); the breakdown is a
    literal-struct unpivot of one row."""
    docs = load_table(spark, "documents", sf_dir)
    row = docs.filter(F.col("doc_id") == _EXPLAIN_DOC)
    clause_cols = []
    for term, boost in _EXPLAIN_CLAUSES:
        sc = F.round(score_query(
            {"match": {"text": {"query": term, "boost": boost}}}), 4)
        clause_cols.append((term, sc))
    total = F.round(score_query({"dis_max": {
        "queries": [{"match": {"text": {"query": t, "boost": b}}}
                    for t, b in _EXPLAIN_CLAUSES],
        "tie_breaker": _EXPLAIN_TB}}), 4)
    structs = [F.struct(F.lit(f"match:{t}").alias("clause"),
                        c.alias("contribution"))
               for t, c in clause_cols]
    structs.append(F.struct(
        F.lit("dis_max_total").alias("clause"),
        total.alias("contribution")))
    return (row.select(F.explode(F.array(*structs)).alias("s"))
            .select(F.lit(_EXPLAIN_DOC).cast("long").alias("doc_id"),
                    F.col("s.clause").alias("clause"),
                    F.col("s.contribution").alias("contribution"),
                    (F.col("s.contribution") > 0).alias("matched"))
            .orderBy("clause"))


def _explain_oracle() -> str:
    def hit(t: str, w: float) -> str:
        return (f"CAST({w!r} * (CASE WHEN {_tok_duck('text', t)} "
                f"THEN 1 ELSE 0 END) AS DOUBLE)")

    parts = [
        f"SELECT {_EXPLAIN_DOC} AS doc_id, 'match:{t}' AS clause, "
        f"round({hit(t, b)}, 4) AS contribution "
        f"FROM documents WHERE doc_id = {_EXPLAIN_DOC}"
        for t, b in _EXPLAIN_CLAUSES]
    ss = [hit(t, b) for t, b in _EXPLAIN_CLAUSES]
    g = f"greatest({ss[0]}, {ss[1]}, {ss[2]})"
    tot = (f"round({g} + {_EXPLAIN_TB} * ({ss[0]} + {ss[1]} + {ss[2]}"
           f" - {g}), 4)")
    parts.append(
        f"SELECT {_EXPLAIN_DOC} AS doc_id, 'dis_max_total' AS clause, "
        f"{tot} AS contribution "
        f"FROM documents WHERE doc_id = {_EXPLAIN_DOC}")
    inner = " UNION ALL ".join(parts)
    return (f"SELECT doc_id, clause, contribution, "
            f"contribution > 0 AS matched FROM ({inner}) t "
            f"ORDER BY clause")


QUERIES.update({
    "dsl_ltr_rescore": dsl_ltr_rescore,
    "dsl_retriever_pipeline": dsl_retriever_pipeline,
    "dsl_explain_score": dsl_explain_score,
})
ORACLES.update({
    "dsl_ltr_rescore": _ltr_oracle(),
    "dsl_retriever_pipeline": _retriever_pipeline_oracle(),
    "dsl_explain_score": _explain_oracle(),
})


# ---------------------------------------------------- dsl_composite_mixed

def dsl_composite_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite agg with MIXED source types — the real composite
    contract (date_histogram x terms in one key tuple, keyset-paged
    with `after`): ES's scale-path agg for exporting a full
    cube slice in key order. The groupBy key is (day, type); the
    `after` cursor compiles to one lexicographic keyset predicate
    evaluated BEFORE the bucket sort, so each page aggregates and
    ships only the keys past the cursor."""
    from parquet_generator_spark.operators.esdsl import search

    ev = load_table(spark, "events", sf_dir)
    return search(ev, {"aggs": {"page": {"composite": {
        "size": 12,
        "sources": [
            {"day": {"date_histogram": {"field": "ts",
                                        "calendar_interval": "day"}}},
            {"etype": {"terms": {"field": "event_type"}}},
        ],
        "after": {"day": "2024-01-10 00:00:00", "etype": "purchase"},
    }, "aggs": {"revenue": {"sum": {"field": "value"}}}}}})


DSL_COMPOSITE_MIXED_ORACLE = """
WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
         event_type AS etype,
         CAST(count(*) AS BIGINT) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM events GROUP BY day, etype)
SELECT day, etype, doc_count, revenue FROM b
WHERE day > '2024-01-10 00:00:00'
   OR (day = '2024-01-10 00:00:00' AND etype > 'purchase')
ORDER BY day, etype
LIMIT 12
"""


# -------------------------------------------------------- dsl_multi_knn

_MK_QV1 = [round(math.sin(0.23 * i + 0.4), 4) for i in range(64)]
_MK_QV2 = [round(math.cos(0.41 * i + 1.3), 4) for i in range(64)]
_MK_WINDOW = 25
_MK_BOOSTS = (1.0, 2.0)
_MK_K = 10


def dsl_multi_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple `knn` clauses in one search (ES 8.7): each clause
    retrieves its own bounded top window against its own query
    vector; final score = sum of boost x similarity over the clauses
    where the doc survived (ES's multi-kNN union semantics). Two
    TakeOrdered legs + one <= window-size outer join."""
    emb = load_table(spark, "embeddings", sf_dir)

    def leg(qv: list[float], out: str) -> DataFrame:
        cos = cosine_to_literal("embedding", qv)
        return (emb.select(F.col("vec_id").alias("id"),
                           cos.alias(out))
                .orderBy(F.desc(out), F.asc("id"))
                .limit(_MK_WINDOW))

    b1, b2 = _MK_BOOSTS
    score = (F.lit(b1) * F.coalesce(F.col("c1"), F.lit(0.0))
             + F.lit(b2) * F.coalesce(F.col("c2"), F.lit(0.0)))
    return (leg(_MK_QV1, "c1").join(leg(_MK_QV2, "c2"),
                                    "id", "full_outer")
            .select("id", "c1", "c2",
                    F.round(score, 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(_MK_K))


def _multi_knn_oracle() -> str:
    def leg_sql(qv: list[float], out: str) -> str:
        cos_sql = cosine_to_literal_duck_sql(
            "CAST(embedding AS DOUBLE[])", qv)
        return f"""
  SELECT vec_id AS id, {cos_sql} AS {out}
  FROM embeddings ORDER BY {out} DESC, id ASC LIMIT {_MK_WINDOW}"""

    b1, b2 = _MK_BOOSTS
    return f"""
WITH l1 AS ({leg_sql(_MK_QV1, 'c1')}),
l2 AS ({leg_sql(_MK_QV2, 'c2')})
SELECT coalesce(l1.id, l2.id) AS id, c1, c2,
       round({b1!r} * coalesce(c1, 0.0)
             + {b2!r} * coalesce(c2, 0.0), 4) AS score
FROM l1 FULL OUTER JOIN l2 ON l1.id = l2.id
ORDER BY score DESC, id ASC LIMIT {_MK_K}
"""


QUERIES.update({
    "dsl_composite_mixed": dsl_composite_mixed,
    "dsl_multi_knn": dsl_multi_knn,
})
ORACLES.update({
    "dsl_composite_mixed": DSL_COMPOSITE_MIXED_ORACLE,
    "dsl_multi_knn": _multi_knn_oracle(),
})


# -------------------------------------------- dsl_collapse_inner_hits

def dsl_collapse_inner_hits(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Field `collapse` WITH `inner_hits`: per source, the collapsed
    top hit plus the group's next 2 hits under the same sort (the
    see-more-from-this-group contract). One keyed rank window serves
    both tiers — hit_rank 1 is the collapsed hit, 2-3 the inner
    hits; no second scan, no join."""
    from parquet_generator_spark.operators.esdsl import collapse_search

    docs = load_table(spark, "documents", sf_dir)
    return collapse_search(docs, {
        "query": {"term": {"lang": "en"}},
        "collapse": {"field": "source",
                     "inner_hits": {"name": "more", "size": 2}},
        "sort": [{"n_chars": "desc"}],
    })


DSL_COLLAPSE_INNER_HITS_ORACLE = """
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY n_chars DESC, doc_id ASC) AS INT) AS hit_rank
  FROM documents WHERE lang = 'en')
SELECT source, hit_rank, doc_id, n_chars
FROM ranked WHERE hit_rank <= 3
ORDER BY source, hit_rank
"""


QUERIES.update({"dsl_collapse_inner_hits": dsl_collapse_inner_hits})
ORACLES.update({"dsl_collapse_inner_hits":
                DSL_COLLAPSE_INNER_HITS_ORACLE})


# ---------------------------------------------- dsl_terms_missing

def dsl_terms_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`terms` agg `missing` parameter: docs whose field is null land
    in a named substitute bucket instead of silently vanishing (ES's
    exact contract; without `missing` they are EXCLUDED — both
    behaviors pinned here via a runtime field that nulls out
    low-value events). The coalesce happens BEFORE the groupBy, so
    the substitute bucket shuffles like any other key."""
    from parquet_generator_spark.operators.esdsl import search

    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "runtime_mappings": {"maybe_type": {
            "expr": "CASE WHEN value < 50 THEN NULL "
                    "ELSE event_type END"}},
        "aggs": {"types": {
            "terms": {"field": "maybe_type", "size": 10,
                      "missing": "(none)"},
            "aggs": {"revenue": {"sum": {"field": "value"}}},
        }},
    })


DSL_TERMS_MISSING_ORACLE = """
SELECT coalesce(CASE WHEN value < 50 THEN NULL
                     ELSE event_type END, '(none)') AS key,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 4) AS revenue
FROM events
GROUP BY key ORDER BY doc_count DESC, key ASC LIMIT 10
"""


QUERIES.update({"dsl_terms_missing": dsl_terms_missing})
ORACLES.update({"dsl_terms_missing": DSL_TERMS_MISSING_ORACLE})


# ------------------------------------------ dsl_date_histogram_tz

_TZ_OFFSET_H = 2   # "+02:00" — bucket midnights in local time


def dsl_date_histogram_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`date_histogram` with `time_zone: "+02:00"`: day buckets cut
    at LOCAL midnight (shift, truncate, shift back — the key stays a
    UTC instant, as ES returns epoch millis). Pure timestamp
    arithmetic on the scan column; same expression text on both
    engines so the boundary rows land identically."""
    ev = load_table(spark, "events", sf_dir)
    shifted = F.expr(
        f"date_trunc('day', ts + INTERVAL {_TZ_OFFSET_H} HOURS) "
        f"- INTERVAL {_TZ_OFFSET_H} HOURS")
    return (ev.filter(F.col("event_type") == "purchase")
            .groupBy(F.date_format(shifted, "yyyy-MM-dd HH:mm:ss")
                     .alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"),
                 F.round(F.sum("value"), 4).alias("revenue"))
            .orderBy("key"))


DSL_DATE_HISTOGRAM_TZ_ORACLE = f"""
SELECT strftime(date_trunc('day', ts + INTERVAL {_TZ_OFFSET_H} HOURS)
                - INTERVAL {_TZ_OFFSET_H} HOURS,
                '%Y-%m-%d %H:%M:%S') AS key,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 4) AS revenue
FROM events WHERE event_type = 'purchase'
GROUP BY key ORDER BY key
"""


QUERIES.update({"dsl_date_histogram_tz": dsl_date_histogram_tz})
ORACLES.update({"dsl_date_histogram_tz": DSL_DATE_HISTOGRAM_TZ_ORACLE})


# ------------------------------------------------ dsl_moving_fn_max

def dsl_moving_fn_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`moving_fn` with MovingFunctions.max and .stdDev scripts over
    a daily revenue histogram (trailing 7-bucket window) — the
    named-reducer moving_fn contract beyond the unweightedAvg
    default. Serial pipes run over the bounded bucket frame only."""
    from parquet_generator_spark.operators.esdsl import search

    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "day"},
            "aggs": {
                "revenue": {"sum": {"field": "value"}},
                "peak7": {"moving_fn": {
                    "buckets_path": "revenue", "window": 7,
                    "script": "MovingFunctions.max(values)"}},
                "vol7": {"moving_fn": {
                    "buckets_path": "revenue", "window": 7,
                    "script": "MovingFunctions.stdDev(values)"}},
            }}},
    })


DSL_MOVING_FN_MAX_ORACLE = """
WITH b AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS key,
         CAST(count(*) AS BIGINT) AS doc_count,
         round(sum(value), 4) AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY key)
SELECT key, doc_count, revenue,
       round(max(revenue) OVER (ORDER BY key
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS peak7,
       round(stddev_pop(revenue) OVER (ORDER BY key
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS vol7
FROM b ORDER BY key
"""


# ------------------------------------------ dsl_terms_min_doc_count

def dsl_terms_min_doc_count(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """`terms` with `min_doc_count`: sparse buckets pruned BEFORE the
    bucket sort, so the response never surfaces keys below the
    support floor (ES's long-tail noise filter)."""
    from parquet_generator_spark.operators.esdsl import search

    ev = load_table(spark, "events", sf_dir)
    return search(ev, {
        "query": {"term": {"event_type": "purchase"}},
        "aggs": {"buyers": {
            "terms": {"field": "user_id", "size": 15,
                      "min_doc_count": 5},
            "aggs": {"spend": {"sum": {"field": "value"}}},
        }},
    })


DSL_TERMS_MIN_DOC_COUNT_ORACLE = """
SELECT user_id AS key,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(sum(value), 4) AS spend
FROM events WHERE event_type = 'purchase'
GROUP BY user_id HAVING count(*) >= 5
ORDER BY doc_count DESC, key ASC LIMIT 15
"""


QUERIES.update({
    "dsl_moving_fn_max": dsl_moving_fn_max,
    "dsl_terms_min_doc_count": dsl_terms_min_doc_count,
})
ORACLES.update({
    "dsl_moving_fn_max": DSL_MOVING_FN_MAX_ORACLE,
    "dsl_terms_min_doc_count": DSL_TERMS_MIN_DOC_COUNT_ORACLE,
})
