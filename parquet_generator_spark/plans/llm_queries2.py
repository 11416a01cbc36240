"""Second wave of LLM-training-data pipeline queries: near-dup
cluster assignment (connected components), corpus n-gram stats,
pattern scrubbing (the PII-redaction shape), and the end-to-end
quality-filter pipeline that strings dedup + language-ID + quality
scoring into one kept-corpus report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators import dedup
from parquet_generator_spark.operators import text as tx
from parquet_generator_spark.operators.util import widen_if_narrow
from parquet_generator_spark.sources.catalog import load_table

from parquet_generator_spark.plans.llm_queries import (
    JACCARD_THRESHOLD,
    near_dup_edges,
)


# --- near-dup cluster assignment ------------------------------------

def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's near-dup cluster id (min doc_id reachable via
    jaccard >= 0.5 pairs; singletons cluster to themselves).

    Pairs come from MinHash-LSH (verified-exact at this threshold —
    see dedup_minhash); components via distributed min-label
    propagation. The corpus only pays one left join at the end.
    """
    docs = load_table(spark, "documents", sf_dir)
    pairs = near_dup_edges(spark, sf_dir)
    cc = dedup.connected_components(pairs)
    return (docs.join(cc, docs["doc_id"] == cc["id"], "left")
            .select("doc_id",
                    F.coalesce("cluster", "doc_id").alias("cluster_id"))
            .orderBy("doc_id"))


_PAIRS_CTE = dedup.jaccard_pairs_duck_sql(
    "documents", "doc_id", "text", JACCARD_THRESHOLD).strip().rstrip()

DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE jp AS ({_PAIRS_CTE}),
e AS (SELECT id_a AS a, id_b AS b FROM jp
      UNION ALL SELECT id_b, id_a FROM jp),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
lab AS (SELECT a AS id, least(a, min(b)) AS cluster
        FROM reach GROUP BY a)
SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN lab l ON d.doc_id = l.id
ORDER BY d.doc_id
"""


# --- corpus n-gram statistics ---------------------------------------

NGRAM_TOPK = 20


def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trigram shingles by document frequency: explode the
    per-doc distinct shingle set, one count shuffle, deterministic
    top-k. The explode keeps partial aggregation map-side, so the
    shuffle carries (shingle, partial_count), not raw text."""
    docs = load_table(spark, "documents", sf_dir)
    sh = widen_if_narrow(docs).select(
        F.explode(F.expr(tx.shingles_spark("text", 3))).alias("shingle"))
    return (sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .orderBy(F.desc("doc_freq"), F.asc("shingle"))
            .limit(NGRAM_TOPK))


NGRAM_TOPK_ORACLE = f"""
SELECT sh AS shingle, count(*) AS doc_freq
FROM (SELECT unnest({tx.shingles_duck('text', 3)}) AS sh FROM documents)
GROUP BY sh ORDER BY doc_freq DESC, shingle ASC
LIMIT {NGRAM_TOPK}
"""


# --- pattern scrub (PII-redaction shape) -----------------------------
# On real corpora the patterns are emails/phones/SSNs; the synthetic
# corpus has no digits, so the term pattern demonstrates the hit path
# while the digit pattern exercises the zero-hit path.

TERM_PAT = r"\b(spark|hash|key)\b"
DIGIT_PAT = r"[0-9]{2,}"


def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    term_hits = F.size(F.regexp_extract_all("text", F.lit(TERM_PAT), F.lit(0)))
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("text").rlike(TERM_PAT), 1).otherwise(0))
                 .alias("docs_with_term"),
                 F.sum(term_hits.cast("bigint")).alias("total_term_hits"),
                 F.sum(F.when(F.col("text").rlike(DIGIT_PAT), 1).otherwise(0))
                 .alias("docs_with_digits"),
                 F.round(F.avg(F.length(
                     F.regexp_replace("text", TERM_PAT, "[X]"))), 2)
                 .alias("avg_redacted_len"))
            .orderBy("source"))


TEXT_SCRUB_ORACLE = f"""
SELECT source,
       count(*) AS n_docs,
       CAST(count(*) FILTER (WHERE regexp_matches(text, '{TERM_PAT}')) AS BIGINT)
         AS docs_with_term,
       CAST(sum(len(regexp_extract_all(text, '{TERM_PAT}'))) AS BIGINT)
         AS total_term_hits,
       CAST(count(*) FILTER (WHERE regexp_matches(text, '{DIGIT_PAT}')) AS BIGINT)
         AS docs_with_digits,
       round(avg(length(regexp_replace(text, '{TERM_PAT}', '[X]', 'g'))), 2)
         AS avg_redacted_len
FROM documents GROUP BY source ORDER BY source
"""


# --- end-to-end quality filter pipeline ------------------------------

QUALITY_MIN = 0.38
TOKENS_MIN, TOKENS_MAX = 20, 1000


def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical training-data filter chain as ONE plan: exact
    dedup (keep min doc_id per content hash, via a window over the
    digest — no second scan), language-ID, quality score, token-count
    bounds; per-source kept-corpus report."""
    docs = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy(F.md5("text"))
    prof = tx.profile_struct_spark("text")
    d = (widen_if_narrow(docs).select(
        "doc_id", "source",
        prof["n_tokens"].alias("n_tokens"),
        prof["quality"].alias("quality"),
        prof["pred_lang"].alias("pred_lang"),
        F.min("doc_id").over(w).alias("keep_id")))
    kept = ((F.col("doc_id") == F.col("keep_id"))
            & (F.col("pred_lang") == "en")
            & (F.col("quality") >= QUALITY_MIN)
            & F.col("n_tokens").between(TOKENS_MIN, TOKENS_MAX))
    return (d.withColumn("kept", kept)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("kept").cast("bigint")).alias("n_kept"),
                 F.round(F.avg(F.when(F.col("kept"), F.col("quality"))), 4)
                 .alias("avg_quality_kept"))
            .orderBy("source"))


_qd = tx.quality_components_duck("text")
QUALITY_PIPELINE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source,
         {_qd['n_tokens']} AS n_tokens,
         {_qd['quality']} AS quality,
         {tx.langid_duck('text')} AS pred_lang,
         min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
  FROM documents),
k AS (
  SELECT *, (doc_id = keep_id AND pred_lang = 'en'
             AND quality >= {QUALITY_MIN}
             AND n_tokens BETWEEN {TOKENS_MIN} AND {TOKENS_MAX}) AS kept
  FROM d)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(avg(CASE WHEN kept THEN quality END), 4) AS avg_quality_kept
FROM k GROUP BY source ORDER BY source
"""


QUERIES = {
    "dedup_clusters": dedup_clusters,
    "ngram_topk": ngram_topk,
    "text_scrub": text_scrub,
    "quality_filter_pipeline": quality_filter_pipeline,
}

ORACLES = {
    "dedup_clusters": DEDUP_CLUSTERS_ORACLE,
    "ngram_topk": NGRAM_TOPK_ORACLE,
    "text_scrub": TEXT_SCRUB_ORACLE,
    "quality_filter_pipeline": QUALITY_PIPELINE_ORACLE,
}
