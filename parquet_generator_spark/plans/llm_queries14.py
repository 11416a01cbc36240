"""LLM-pipeline wave 12: maximal-span exact substring dedup.

`span_dedup` (llm_queries5) implements the fixed-K-window variant of
Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
Better"): which K-token windows occur >= 2 times corpus-wide. The
suffix-array formulation the dedup literature ships at corpus scale
reports the LONGEST duplicated span instead. This query closes that
gap at the span-merge level: every duplicated K-window is an interval
[i, i+K) of token positions; consecutive duplicated window offsets
merge into islands (classic gaps-and-islands via offset - keyed
row_number), and an island of L consecutive offsets is a maximal
duplicated span of L + K - 1 tokens — exactly the union of its
windows. Equivalent to the suffix-array answer whenever the true
longest duplicated substring is >= K tokens (shorter duplicates are
below the K-token floor by design, as in Lee et al.'s minimum match
length).

Scale posture: the span explode + (span)-keyed totals are the same
two keyed shuffles as span_dedup (nothing pairwise — text never
compares against text); the island window partitions by doc_id
(keyed, parallel across docs); every downstream frame is
doc-cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.text import toks_duck, toks_spark
from parquet_generator_spark.operators.util import widen_if_narrow
from parquet_generator_spark.plans.llm_queries5 import SPAN_K
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def maximal_dup_spans(docs: DataFrame) -> DataFrame:
    """Per-document maximal duplicated spans over a (doc_id, text)
    frame: longest duplicated span length (tokens; 0 if none reaches
    the K floor), number of maximal spans (islands), and the total
    tokens covered by duplicated spans (union length,
    double-count-free)."""
    toks = toks_spark("text")
    spans = docs.select(
        F.col("doc_id"),
        F.posexplode(F.expr(
            f"CASE WHEN size({toks}) >= {SPAN_K} THEN "
            f"transform(sequence(0, size({toks}) - {SPAN_K}), "
            f"i -> array_join(slice({toks}, i + 1, {SPAN_K}), ' ')) "
            f"ELSE array() END")).alias("off", "span"))
    totals = spans.groupBy("span").agg(F.count(F.lit(1)).alias("total"))
    dup_off = (spans.join(totals, "span")
               .filter(F.col("total") >= 2)
               .select("doc_id", "off"))
    w = Window.partitionBy("doc_id").orderBy("off")
    islands = (dup_off
               .withColumn("isl", F.col("off")
                           - F.row_number().over(w))
               .groupBy("doc_id", "isl")
               .agg(F.count(F.lit(1)).alias("run")))
    per_doc = (islands.groupBy("doc_id")
               .agg(F.max(F.col("run") + F.lit(SPAN_K - 1))
                    .alias("max_dup_span"),
                    F.count(F.lit(1)).alias("n_spans"),
                    F.sum(F.col("run") + F.lit(SPAN_K - 1))
                    .alias("dup_tokens")))
    return (docs.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("max_dup_span", F.lit(0))
                    .cast("long").alias("max_dup_span"),
                    F.coalesce("n_spans", F.lit(0))
                    .cast("long").alias("n_spans"),
                    F.coalesce("dup_tokens", F.lit(0))
                    .cast("long").alias("dup_tokens"))
            .orderBy("doc_id"))


def span_dedup_maximal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = widen_if_narrow(load_table(spark, "documents", sf_dir))
    return maximal_dup_spans(docs)


SPAN_DEDUP_MAXIMAL_ORACLE = f"""
WITH t AS (SELECT doc_id, {toks_duck('text')} AS tk FROM documents),
sp AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS off,
         list_aggr(tk[u.i + 1 : u.i + {SPAN_K}], 'string_agg', ' ')
           AS span
  FROM t, unnest(CASE WHEN len(tk) >= {SPAN_K}
                 THEN range(0, len(tk) - {SPAN_K} + 1)
                 ELSE [] END) AS u(i)),
tot AS (SELECT span, count(*) AS total FROM sp GROUP BY span),
dup AS (
  SELECT s.doc_id, s.off FROM sp s JOIN tot USING (span)
  WHERE tot.total >= 2),
isl AS (
  SELECT doc_id,
         off - row_number() OVER (PARTITION BY doc_id ORDER BY off)
           AS grp
  FROM dup),
runs AS (
  SELECT doc_id, grp, count(*) AS run FROM isl
  GROUP BY doc_id, grp),
agg AS (
  SELECT doc_id,
         CAST(max(run + {SPAN_K - 1}) AS BIGINT) AS max_dup_span,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(run + {SPAN_K - 1}) AS BIGINT) AS dup_tokens
  FROM runs GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.max_dup_span, 0) AS max_dup_span,
       COALESCE(a.n_spans, 0) AS n_spans,
       COALESCE(a.dup_tokens, 0) AS dup_tokens
FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id
"""

QUERIES.update({"span_dedup_maximal": span_dedup_maximal})
ORACLES.update({"span_dedup_maximal": SPAN_DEDUP_MAXIMAL_ORACLE})
