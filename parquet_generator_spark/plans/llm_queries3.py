"""Third wave of training-data pipeline queries: corpus vocabulary
coverage (tokenizer-design input) and per-label embedding centroid
quality (embedding-space health check).

Both stay declarative end-to-end. The vocabulary cumsum runs over
post-aggregation vocab-cardinality rows (a global window over ~1e5-1e6
words, not the corpus); the centroid computation is the standard
posexplode -> (label, dim) average -> re-assemble shape, all shuffles
on bounded-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.similarity import cosine, norm
from parquet_generator_spark.operators.text import toks_duck, toks_spark
from parquet_generator_spark.sources.catalog import load_table

VOCAB_TOP = 50


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N corpus vocabulary with cumulative token coverage: after
    the word-count aggregation the data is vocab-sized, so the global
    ordering window is cheap; the corpus itself is one scan + one
    shuffle on word."""
    docs = load_table(spark, "documents", sf_dir)
    words = docs.select(
        F.explode(F.expr(toks_spark("text"))).alias("word"))
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    order = Window.orderBy(F.desc("cnt"), F.asc("word"))
    total = Window.partitionBy()
    return (counts
            .withColumn("rank", F.row_number().over(order))
            .withColumn("cum", F.sum("cnt").over(
                order.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
            .withColumn("coverage",
                        F.round(F.col("cum") / F.sum("cnt").over(total), 4))
            .filter(F.col("rank") <= VOCAB_TOP)
            .select("rank", "word", "cnt", "coverage")
            .orderBy("rank"))


VOCAB_COVERAGE_ORACLE = f"""
WITH w AS (
  SELECT unnest({toks_duck('text')}) AS word FROM documents),
c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
r AS (
  SELECT word, cnt,
         row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank,
         sum(cnt) OVER (ORDER BY cnt DESC, word ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(cnt) OVER () AS total
  FROM c)
SELECT rank, word, cnt, round(cum * 1.0 / total, 4) AS coverage
FROM r WHERE rank <= {VOCAB_TOP} ORDER BY rank
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid: vector count, centroid norm, and
    mean cosine of members to their centroid (cluster-cohesion
    metric). posexplode -> per-(label, dim) mean -> reassemble, then
    one broadcast-sized join back to score members."""
    emb = load_table(spark, "embeddings", sf_dir)
    pos = emb.select("label",
                     F.posexplode("embedding").alias("i", "x"))
    cent = (pos.groupBy("label", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m")))
                 .alias("sm"))
            .select("label",
                    F.expr("transform(sm, s -> s.m)").alias("centroid")))
    scored = (emb.join(F.broadcast(cent), "label")
              .select("label", cosine("embedding", "centroid").alias("cos")))
    per_label = (scored.groupBy("label")
                 .agg(F.count(F.lit(1)).alias("n_vecs"),
                      F.round(F.avg("cos"), 4).alias("avg_cos")))
    norms = cent.select("label",
                        F.round(norm("centroid"), 4).alias("centroid_norm"))
    return (per_label.join(norms, "label")
            .select("label", "n_vecs", "centroid_norm", "avg_cos")
            .orderBy("label"))


EMBEDDING_CENTROIDS_ORACLE = """
WITH pos AS (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS x,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings),
cent AS (
  SELECT label, i, avg(x) AS m FROM pos GROUP BY label, i),
cvec AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM cent GROUP BY label),
scored AS (
  SELECT e.label,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), c.centroid)
         / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                  CAST(e.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(c.centroid, c.centroid))) AS cos
  FROM embeddings e JOIN cvec c USING (label))
SELECT s.label, count(*) AS n_vecs,
       round(sqrt(list_dot_product(c.centroid, c.centroid)), 4)
         AS centroid_norm,
       round(avg(s.cos), 4) AS avg_cos
FROM scored s JOIN cvec c ON s.label = c.label
GROUP BY s.label, c.centroid
ORDER BY s.label
"""


QUERIES = {
    "vocab_coverage": vocab_coverage,
    "embedding_centroids": embedding_centroids,
}

ORACLES = {
    "vocab_coverage": VOCAB_COVERAGE_ORACLE,
    "embedding_centroids": EMBEDDING_CENTROIDS_ORACLE,
}
