"""Sixth wave of LLM-training-data pipeline queries: embedding
quantization (ANN storage prep), cross-source duplicate-leakage
matrix, and a Zipf-fit corpus health check. DuckDB oracles mirror
every step bit-for-bit (shared float64 inputs + identical arithmetic
order), so all three are hash-gated like exact queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.text import toks_duck, toks_spark
from parquet_generator_spark.sources.catalog import load_table


# ------------------------------------------------------ embedding_quantize

def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 (0..255) affine quantization — the storage
    prep step before a large ANN index ships: scale = (max-min)/255,
    code_i = round((x_i-min)/scale). Output per vector: the scale,
    the code checksum (proves the exact same codes on any engine),
    and the max reconstruction error (bounded by scale/2 by
    construction). Everything is a narrow Catalyst map over the
    embedding array — no shuffle, no UDF; at 100 TB this runs at
    scan speed. Exactly mirrored in DuckDB: both engines fold the
    same float64 values with the same operation order, so codes are
    bit-identical, not just close."""
    emb = load_table(spark, "embeddings", sf_dir)
    return (emb
            .select("vec_id",
                    F.expr("transform(embedding, x -> cast(x AS DOUBLE))")
                    .alias("e"))
            .select("vec_id", "e",
                    F.array_min("e").alias("mn"),
                    F.array_max("e").alias("mx"))
            .select("vec_id", "e", "mn",
                    F.expr("CASE WHEN mx > mn THEN (mx - mn) / 255.0 "
                           "ELSE 1.0 END").alias("sc"))
            .select("vec_id", "e", "mn", "sc",
                    F.expr("transform(e, x -> "
                           "cast(round((x - mn) / sc) AS BIGINT))")
                    .alias("codes"))
            .select("vec_id",
                    F.round("sc", 6).alias("scale"),
                    F.expr("aggregate(codes, cast(0 AS BIGINT), "
                           "(a, c) -> a + c)").alias("code_sum"),
                    F.round(F.expr(
                        "aggregate(zip_with(e, codes, "
                        "(x, c) -> abs(x - (mn + c * sc))), "
                        "cast(0.0 AS DOUBLE), "
                        "(a, v) -> greatest(a, v))"), 6).alias("max_err"))
            .orderBy("vec_id"))


EMBEDDING_QUANTIZE_ORACLE = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
m AS (SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v),
s AS (SELECT vec_id, e, mn,
             CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS sc
      FROM m),
c AS (SELECT vec_id, e, mn, sc,
             list_transform(e, x ->
               CAST(round((x - mn) / sc) AS BIGINT)) AS codes
      FROM s)
SELECT vec_id,
       round(sc, 6) AS scale,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       round(list_max(list_transform(generate_series(1, len(e)),
             i -> abs(e[i] - (mn + codes[i] * sc)))), 6) AS max_err
FROM c ORDER BY vec_id
"""


# ------------------------------------------------------ source_overlap

def source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-leakage matrix: for every source pair
    (incl. the diagonal), how many DISTINCT contents appear in both.
    The report that catches a benchmark split leaking into training
    sources. No pairwise doc scan: one distinct on (md5, source),
    one groupBy(md5) whose per-hash source set is bounded by the
    number of sources, pairs generated array-side, one final count
    shuffle keyed on the (src_a, src_b) pair."""
    docs = load_table(spark, "documents", sf_dir)
    hs = docs.select(F.md5("text").alias("h"), "source").distinct()
    grouped = (hs.groupBy("h")
               .agg(F.array_sort(F.collect_set("source")).alias("ss")))
    pairs = grouped.select(F.explode(F.expr(
        "flatten(transform(sequence(0, size(ss) - 1), "
        "i -> transform(sequence(i, size(ss) - 1), "
        "j -> struct(ss[i] AS src_a, ss[j] AS src_b))))")).alias("p"))
    return (pairs.groupBy("p.src_a", "p.src_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .select(F.col("src_a"), F.col("src_b"), "n_shared")
            .orderBy("src_a", "src_b"))


SOURCE_OVERLAP_ORACLE = """
WITH hs AS (SELECT DISTINCT md5(text) AS h, source FROM documents)
SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
FROM hs a JOIN hs b ON a.h = b.h AND a.source <= b.source
GROUP BY src_a, src_b ORDER BY src_a, src_b
"""


# ------------------------------------------------------ zipf_slope

ZIPF_TOP = 1000


def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health check: the log-log slope of frequency vs rank
    over the top-K vocabulary (natural text ~ -1; synthetic or
    template-heavy corpora drift flat). The top-K comes from
    ``orderBy().limit()`` (TakeOrderedAndProject — no vocab-wide
    sort or window); the rank window and the regr_slope fold then
    run over K bounded rows."""
    docs = load_table(spark, "documents", sf_dir)
    counts = (docs.select(
        F.explode(F.expr(toks_spark("text"))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    top = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(ZIPF_TOP)
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    return ranked.agg(
        F.round(F.expr("regr_slope(ln(cnt), ln(rank))"), 3)
        .alias("zipf_slope"),
        F.count(F.lit(1)).alias("n_terms"))


ZIPF_SLOPE_ORACLE = f"""
WITH toks AS (
  SELECT unnest({toks_duck('text')}) AS word FROM documents),
c AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
t AS (SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank
      FROM c ORDER BY cnt DESC, word ASC LIMIT {ZIPF_TOP})
SELECT round(regr_slope(ln(cnt), ln(rank)), 3) AS zipf_slope,
       count(*) AS n_terms
FROM t
"""


QUERIES = {
    "embedding_quantize": embedding_quantize,
    "source_overlap": source_overlap,
    "zipf_slope": zipf_slope,
}

ORACLES = {
    "embedding_quantize": EMBEDDING_QUANTIZE_ORACLE,
    "source_overlap": SOURCE_OVERLAP_ORACLE,
    "zipf_slope": ZIPF_SLOPE_ORACLE,
}
