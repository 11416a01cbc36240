"""Fourth wave of training-data / behavioral analytics queries:
Gopher-style repetition quality rules, funnel analysis, and cohort
retention.

gopher_quality adapts the Gopher/MassiveText repetition filters
(Rae et al. 2021, "Scaling Language Models", App. A) to the word-
stream documents table: type-token ratio, top-word and top-bigram
mass fractions, mean word length — all computed with built-in
explode/groupBy (map-side partial aggregation keeps the shuffle at
distinct-terms-per-doc, not token count; no Python in the hot path).

funnel_stages / cohort_retention are the standard product-analytics
operators over the events table, built as staged aggregate joins
(each stage collapses to user-cardinality before the next join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table


# ----------------------------------------------------- gopher_quality

GOPHER_MIN_WORDS = 20
GOPHER_TTR_MIN = 0.4
GOPHER_TOP_WORD_MAX = 0.15
GOPHER_TOP_BIGRAM_MAX = 0.05
GOPHER_WLEN_LO = 4.0
GOPHER_WLEN_HI = 5.0


def gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition/quality profile with a keep flag.

    ONE scan, ONE explode, two grouped passes: unigrams and bigrams
    (built array-side with a transform-over-sequence — no window
    sort) are tagged and unioned into a single exploded term list, so
    the text column is read once; groupBy(doc_id, kind, term) with
    map-side combine collapses token counts before the shuffle, and
    conditional aggregates split the two profiles back apart at doc
    granularity. All ratios are exact integer-count divisions, so
    they are bit-identical across engines."""
    from parquet_generator_spark.operators.util import widen_if_narrow
    docs = (widen_if_narrow(load_table(spark, "documents", sf_dir))
            .select("doc_id", F.split("text", " ").alias("a")))
    # kind 'w' = unigram, 'b' = bigram, tagged structs in one array
    terms = docs.select("doc_id", F.explode(F.expr(
        "concat("
        "  transform(a, w -> struct('w' AS kind, w AS term)),"
        "  transform(sequence(1, size(a) - 1),"
        "    i -> struct('b' AS kind,"
        "                concat(element_at(a, i), ' ',"
        "                       element_at(a, i + 1)) AS term)))"))
        .alias("t")).select("doc_id", "t.kind", "t.term")
    is_w = F.col("kind") == "w"
    stats = (terms.groupBy("doc_id", "kind", "term").count()
             .groupBy("doc_id")
             .agg(F.sum(F.when(is_w, F.col("count"))).alias("n_words"),
                  F.count(F.when(is_w, 1)).alias("n_distinct"),
                  F.max(F.when(is_w, F.col("count"))).alias("max_wc"),
                  (F.sum(F.when(is_w, F.col("count") * F.length("term")))
                   / F.sum(F.when(is_w, F.col("count"))))
                  .alias("mean_wlen"),
                  F.sum(F.when(~is_w, F.col("count"))).alias("n_bg"),
                  F.max(F.when(~is_w, F.col("count"))).alias("max_bg")))
    ttr = F.col("n_distinct") / F.col("n_words")
    top_word = F.col("max_wc") / F.col("n_words")
    top_bigram = F.col("max_bg") / F.col("n_bg")
    keep = ((F.col("n_words") >= GOPHER_MIN_WORDS)
            & (ttr >= GOPHER_TTR_MIN)
            & (top_word <= GOPHER_TOP_WORD_MAX)
            & (top_bigram <= GOPHER_TOP_BIGRAM_MAX)
            & F.col("mean_wlen").between(GOPHER_WLEN_LO, GOPHER_WLEN_HI))
    return (stats
            .select("doc_id", "n_words", "n_distinct",
                    F.round(ttr, 4).alias("ttr"),
                    F.round(top_word, 4).alias("top_word_frac"),
                    F.round(top_bigram, 4).alias("top_bigram_frac"),
                    F.round("mean_wlen", 4).alias("mean_wlen"),
                    keep.alias("keep"))
            .orderBy("doc_id"))


GOPHER_CTES = f"""
w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
wc AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
ws AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS max_wc,
         CAST(sum(c * length(word)) AS BIGINT) AS wlen_sum
  FROM wc GROUP BY 1),
ba AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
bi AS (SELECT doc_id, a,
              unnest(generate_series(1, len(a) - 1)) AS i
       FROM ba),
bg AS (SELECT doc_id, a[i] || ' ' || a[i + 1] AS b FROM bi),
bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bg,
              CAST(max(c) AS BIGINT) AS max_bg
       FROM bc GROUP BY 1)"""

GOPHER_KEEP_PRED = f"""(n_words >= {GOPHER_MIN_WORDS}
        AND n_distinct / n_words >= {GOPHER_TTR_MIN}
        AND max_wc / n_words <= {GOPHER_TOP_WORD_MAX}
        AND max_bg / n_bg <= {GOPHER_TOP_BIGRAM_MAX}
        AND wlen_sum / n_words BETWEEN {GOPHER_WLEN_LO} AND {GOPHER_WLEN_HI})"""

GOPHER_ORACLE = f"""
WITH {GOPHER_CTES}
SELECT ws.doc_id, n_words, n_distinct,
       round(n_distinct / n_words, 4) AS ttr,
       round(max_wc / n_words, 4) AS top_word_frac,
       round(max_bg / n_bg, 4) AS top_bigram_frac,
       round(wlen_sum / n_words, 4) AS mean_wlen,
       {GOPHER_KEEP_PRED}
         AS keep
FROM ws JOIN bs ON ws.doc_id = bs.doc_id
ORDER BY ws.doc_id
"""


# ------------------------------------------------------ funnel_stages

FUNNEL = ("view", "click", "purchase")


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked
    AFTER their first view, then purchased AFTER that first qualifying
    click.

    ONE scan and ONE shuffle: per user, collect the first view time
    plus the (per-user-bounded) click/purchase timestamp lists, then
    resolve the stage chain with array filter + array_min — no
    per-stage re-scan or join. If per-user event counts were
    unbounded, the staged aggregate-join formulation would replace
    the collect_list."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts")
    per_user = (ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL[0],
                     F.col("ts"))).alias("t_view"),
        F.collect_list(F.when(F.col("event_type") == FUNNEL[1],
                              F.col("ts"))).alias("clicks"),
        F.collect_list(F.when(F.col("event_type") == FUNNEL[2],
                              F.col("ts"))).alias("purchases")))
    staged = (per_user
              .withColumn("t_click", F.expr(
                  "array_min(filter(clicks, c -> c > t_view))"))
              .withColumn("t_purchase", F.expr(
                  "array_min(filter(purchases, p -> p > t_click))")))
    return staged.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"))


FUNNEL_ORACLE = f"""
WITH v AS (SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = '{FUNNEL[0]}' GROUP BY 1),
c AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = '{FUNNEL[1]}' GROUP BY 1),
p AS (SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = '{FUNNEL[2]}' GROUP BY 1)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase
"""


# --------------------------------------------------- cohort_retention

RETENTION_MAX_WEEKS = 4


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention by first-seen cohort: each user's cohort is
    the day of their first event; activity weeks are day-offsets / 7
    from that anchor. The first-seen anchor is USER-cardinality, so it
    joins back onto events with a plain equi-join (both sides already
    key on user_id; AQE broadcasts only if runtime stats allow —
    billions of users at 100x must shuffle, not broadcast); the
    distinct-user count shuffles on the (cohort, week) pair."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date("ts").alias("d"))
    first = ev.groupBy("user_id").agg(F.min("d").alias("first_d"))
    week = F.floor(F.datediff(F.col("d"), F.col("first_d")) / 7)
    return (ev.join(first, "user_id")
            .withColumn("week_offset", week.cast("int"))
            .filter(F.col("week_offset") < RETENTION_MAX_WEEKS)
            .groupBy(F.date_format("first_d", "yyyy-MM-dd")
                     .alias("cohort_day"), "week_offset")
            .agg(F.countDistinct("user_id").alias("n_users"))
            .orderBy("cohort_day", "week_offset"))


RETENTION_ORACLE = f"""
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
f AS (SELECT user_id, min(d) AS first_d FROM ev GROUP BY 1)
SELECT strftime(first_d, '%Y-%m-%d') AS cohort_day,
       CAST(floor(date_diff('day', first_d, d) / 7.0) AS INT)
         AS week_offset,
       count(DISTINCT ev.user_id) AS n_users
FROM ev JOIN f ON ev.user_id = f.user_id
WHERE floor(date_diff('day', first_d, d) / 7.0) < {RETENTION_MAX_WEEKS}
GROUP BY cohort_day, week_offset
ORDER BY cohort_day, week_offset
"""


# ------------------------------------------------------ knn_classify

KNN_K = 5
KNN_QUERY_MOD = 20


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote label prediction over the embeddings table:
    every 20th vector is a query; its label is predicted from the 5
    nearest (cosine) neighbors among the rest. Reuses the brute-force
    top-k kernel (queries broadcast, corpus scanned once); the vote is
    a count per (query, label) + one window rank. At scale the
    brute-force kernel swaps for the IVF/LSH path unchanged; the
    label/truth lookups are corpus-cardinality, so they join without
    a broadcast hint (AQE decides)."""
    from parquet_generator_spark.operators.similarity import (
        brute_force_topk,
    )
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") % KNN_QUERY_MOD == 0)
    topk = brute_force_topk(emb, queries, KNN_K)
    labels = emb.select(F.col("vec_id").alias("nid"),
                        F.col("label").alias("n_label"))
    from pyspark.sql import Window
    votes = (topk.join(labels, "nid")
             .groupBy("qid", "n_label")
             .agg(F.count(F.lit(1)).alias("votes")))
    w = Window.partitionBy("qid").orderBy(F.desc("votes"),
                                          F.asc("n_label"))
    pred = (votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1))
    truth = emb.select(F.col("vec_id").alias("qid"),
                       F.col("label").alias("true_label"))
    return (pred.join(truth, "qid")
            .select("qid", "true_label",
                    F.col("n_label").alias("pred_label"), "votes")
            .orderBy("qid"))


def _knn_oracle() -> str:
    from parquet_generator_spark.operators.similarity import (
        brute_force_topk_duck_sql,
    )
    topk = brute_force_topk_duck_sql(
        "embeddings", KNN_K,
        f"vec_id % {KNN_QUERY_MOD} = 0").strip()
    return f"""
WITH ranked AS ({topk}),
votes AS (
  SELECT r.qid, e.label AS n_label, count(*) AS votes
  FROM ranked r JOIN embeddings e ON r.nid = e.vec_id
  GROUP BY r.qid, e.label),
pred AS (
  SELECT qid, n_label, votes,
         row_number() OVER (PARTITION BY qid
                            ORDER BY votes DESC, n_label ASC) AS rk
  FROM votes)
SELECT p.qid, t.label AS true_label, p.n_label AS pred_label, p.votes
FROM pred p JOIN embeddings t ON p.qid = t.vec_id
WHERE p.rk = 1
ORDER BY p.qid
"""


KNN_ORACLE = _knn_oracle()


# ------------------------------------------------- stratified_sample

STRATUM_SIZE = 10


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size-per-stratum sample: the first
    STRATUM_SIZE documents of each source, ordered by an md5 hash of
    the doc id — a reproducible balanced training mixture independent
    of engine, layout, and partitioning (same contract as
    train_test_split). One shuffle on the stratum key; a skewed
    stratum can salt the window into ranges at scale."""
    from pyspark.sql import Window
    docs = load_table(spark, "documents", sf_dir)
    h = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.asc("doc_id"))
    return (docs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= STRATUM_SIZE)
            .select("source", "doc_id", "rk")
            .orderBy("source", "rk"))


STRATIFIED_ORACLE = f"""
SELECT source, doc_id, rk
FROM (
  SELECT source, doc_id,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)) ASC,
                    doc_id ASC) AS rk
  FROM documents)
WHERE rk <= {STRATUM_SIZE}
ORDER BY source, rk
"""


# ----------------------------------------------- corpus_prep_pipeline


def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation, composed from the
    individually-oracle-checked stages: Gopher quality keep + exact
    dedup (canonical copy only) + benchmark decontamination (drop any
    doc sharing a 5-shingle with the held-out source, and the
    held-out source itself) + deterministic hash split — reporting
    docs and whitespace tokens per (split, source).

    Each stage reduces to a doc-id set, so the composition is three
    semi/anti joins on the corpus scan plus one aggregate. In
    production the stage outputs are staged tables (computed once,
    reused); here they recompute from the shared scan, which AQE
    handles at test scale."""
    from parquet_generator_spark.operators import dedup as dedup_ops
    from parquet_generator_spark.operators.text import shingles_spark
    from parquet_generator_spark.plans.llm_queries3 import (
        BENCH_SOURCE,
        DECON_K,
    )
    from parquet_generator_spark.plans.pipeline_queries import (
        SPLIT_BUCKETS,
        _bucket_spark,
    )
    docs = load_table(spark, "documents", sf_dir)
    # quality stage carries its word count along: n_words from the
    # gopher profile IS size(split(text, ' ')), so the final pass
    # never re-reads text (round 13 — the before-plan re-scanned and
    # re-split every kept document just to count tokens, guide §2.3)
    quality = (gopher_quality(spark, sf_dir)
               .filter(F.col("keep")).select("doc_id", "n_words"))
    canonical = (dedup_ops.exact_dedup_groups(docs, "doc_id", "text")
                 .select(F.col("keep_id").alias("doc_id")))
    # lean contamination set: the composition only needs the doc ids
    # sharing >= 1 shingle with the bench source — the standalone
    # decontaminate query's per-doc countDistinct and global orderBy
    # added two exchanges and a range sort the anti-join discards
    sh = F.expr(shingles_spark("text", DECON_K))
    bench = (docs.filter(F.col("source") == BENCH_SOURCE)
             .select(F.explode(sh).alias("s")).distinct())
    contaminated = (docs.filter(F.col("source") != BENCH_SOURCE)
                    .select("doc_id", F.explode(sh).alias("s"))
                    .join(F.broadcast(bench), "s")
                    .select("doc_id").distinct())
    b = _bucket_spark("doc_id")
    split = (F.when(b < SPLIT_BUCKETS[0], "train")
             .when(b < SPLIT_BUCKETS[1], "val")
             .otherwise("test"))
    final = (docs.filter(F.col("source") != BENCH_SOURCE)
             .select("doc_id", "source")
             .join(quality, "doc_id")
             .join(canonical, "doc_id", "left_semi")
             .join(contaminated, "doc_id", "left_anti")
             .withColumn("split", split))
    return (final.groupBy("split", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("n_tokens"))
            .orderBy("split", "source"))


def _corpus_prep_oracle() -> str:
    from parquet_generator_spark.operators.text import shingles_duck
    from parquet_generator_spark.plans.llm_queries3 import (
        BENCH_SOURCE,
        DECON_K,
    )
    from parquet_generator_spark.plans.pipeline_queries import (
        SPLIT_BUCKETS,
    )
    bucket = ("CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),"
              " 1, 8)) AS BIGINT) % 100")
    return f"""
WITH {GOPHER_CTES},
keepq AS (
  SELECT ws.doc_id FROM ws JOIN bs ON ws.doc_id = bs.doc_id
  WHERE {GOPHER_KEEP_PRED}),
canonical AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
sh AS (
  SELECT doc_id, source, {shingles_duck('text', DECON_K)} AS shs
  FROM documents),
bench AS (
  SELECT DISTINCT unnest(shs) AS s FROM sh
  WHERE source = '{BENCH_SOURCE}'),
corpus AS (
  SELECT doc_id, unnest(shs) AS s FROM sh
  WHERE source <> '{BENCH_SOURCE}'),
contaminated AS (
  SELECT DISTINCT doc_id FROM corpus JOIN bench USING (s)),
final AS (
  SELECT doc_id, source, text,
         CASE WHEN {bucket} < {SPLIT_BUCKETS[0]} THEN 'train'
              WHEN {bucket} < {SPLIT_BUCKETS[1]} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
  WHERE source <> '{BENCH_SOURCE}'
    AND doc_id IN (SELECT doc_id FROM keepq)
    AND doc_id IN (SELECT doc_id FROM canonical)
    AND doc_id NOT IN (SELECT doc_id FROM contaminated))
SELECT split, source, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM final GROUP BY split, source ORDER BY split, source
"""


CORPUS_PREP_ORACLE = _corpus_prep_oracle()


# ---------------------------------------------- embedding_group_stats


def embedding_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label second-moment statistics of the embedding cloud
    (mean-vector norm, covariance trace = total variance) via
    applyInPandas — the grouped-map Pandas UDF: each label's vectors
    arrive as ONE Arrow batch and numpy does the matrix math. This is
    the correct tool when per-group logic is genuinely matrix-shaped
    (whitening, PCA, calibration); a group must fit in executor
    memory, so giant groups get pre-chunked with a salt at scale."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, "embeddings", sf_dir)

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mu = m.mean(axis=0)
        return pd.DataFrame({
            "label": [int(pdf["label"].iloc[0])],
            "n": [len(m)],
            "mean_norm": [float(np.sqrt((mu * mu).sum()))],
            "var_trace": [float(m.var(axis=0).sum())],
        })

    out = emb.groupBy("label").applyInPandas(
        stats, "label int, n long, mean_norm double, var_trace double")
    return (out.select("label", "n",
                       F.round("mean_norm", 4).alias("mean_norm"),
                       F.round("var_trace", 4).alias("var_trace"))
            .orderBy("label"))


EMBEDDING_GROUP_STATS_ORACLE = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
di AS (SELECT label, v,
              unnest(generate_series(1, len(v))) AS i
       FROM e),
dd AS (SELECT label, i, v[i] AS x FROM di),
per_dim AS (SELECT label, i, avg(x) AS mu, var_pop(x) AS vp
            FROM dd GROUP BY label, i),
agg AS (SELECT label, round(sqrt(sum(mu * mu)), 4) AS mean_norm,
               round(sum(vp), 4) AS var_trace
        FROM per_dim GROUP BY label),
cnt AS (SELECT label, count(*) AS n FROM e GROUP BY label)
SELECT a.label, n, mean_norm, var_trace
FROM agg a JOIN cnt USING (label)
ORDER BY a.label
"""


QUERIES = {
    "embedding_group_stats": embedding_group_stats,
    "corpus_prep_pipeline": corpus_prep_pipeline,
    "knn_classify": knn_classify,
    "stratified_sample": stratified_sample,
    "gopher_quality": gopher_quality,
    "funnel_stages": funnel_stages,
    "cohort_retention": cohort_retention,
}

ORACLES = {
    "embedding_group_stats": EMBEDDING_GROUP_STATS_ORACLE,
    "corpus_prep_pipeline": CORPUS_PREP_ORACLE,
    "knn_classify": KNN_ORACLE,
    "stratified_sample": STRATIFIED_ORACLE,
    "gopher_quality": GOPHER_ORACLE,
    "funnel_stages": FUNNEL_ORACLE,
    "cohort_retention": RETENTION_ORACLE,
}
