"""LLM-pipeline wave 13: boilerplate detection, data-card length
histogram, and windowed trending types.

Scale posture: boilerplate grouping shuffles on the prefix hash
(map-side partial agg, group cardinality bounded by distinct
prefixes); the length histogram is pure log arithmetic + one grouped
pass; windowed top-k is a keyed window PARTITIONED by the day bucket
(parallel across days, never global).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.text import toks_duck, toks_spark
from parquet_generator_spark.operators.util import widen_if_narrow
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------- boilerplate_prefix_groups

PREFIX_K = 6  # first K analyzed tokens define the boilerplate key
BOILERPLATE_MIN = 2


def boilerplate_prefix_groups(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Boilerplate/header detection: documents sharing their first
    PREFIX_K analyzed tokens (the shared-template signature scraped
    corpora exhibit — identical page headers, license banners, forum
    signatures). One md5 of the joined prefix -> groupBy on the hash;
    groups below BOILERPLATE_MIN members drop. Reports each group's
    size, the repeated prefix, and the member span (min/max doc_id)
    so a curation run can strip or keep-one."""
    docs = widen_if_narrow(load_table(spark, "documents", sf_dir))
    toks = toks_spark("text")
    pref = (docs.select(
        "doc_id",
        F.expr(f"array_join(slice({toks}, 1, {PREFIX_K}), ' ')")
        .alias("prefix"))
        .filter(F.expr(f"size({toks}) >= {PREFIX_K}")))
    return (pref.groupBy("prefix")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc"))
            .filter(F.col("n_docs") >= BOILERPLATE_MIN)
            .orderBy(F.desc("n_docs"), F.asc("prefix")))


BOILERPLATE_PREFIX_ORACLE = f"""
WITH t AS (SELECT doc_id, {toks_duck('text')} AS tk FROM documents),
p AS (
  SELECT doc_id,
         list_aggr(tk[1 : {PREFIX_K}], 'string_agg', ' ') AS prefix
  FROM t WHERE len(tk) >= {PREFIX_K})
SELECT prefix, count(*) AS n_docs,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM p GROUP BY prefix
HAVING count(*) >= {BOILERPLATE_MIN}
ORDER BY n_docs DESC, prefix ASC
"""


# ------------------------------------------------ length_log_histogram

def length_log_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card length distribution: per-source histogram of doc
    lengths in power-of-2 character buckets (floor(log2(n_chars))) —
    the standard long-tail-friendly length chart. Pure per-row log
    arithmetic, one grouped pass."""
    docs = load_table(spark, "documents", sf_dir)
    bucket = F.floor(F.log2(F.col("n_chars").cast("double")))
    return (docs.filter(F.col("n_chars") > 0)
            .groupBy("source", bucket.cast("long").alias("log2_bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"))
            .orderBy("source", "log2_bucket"))


LENGTH_LOG_HISTOGRAM_ORACLE = """
SELECT source,
       CAST(floor(log2(CAST(n_chars AS DOUBLE))) AS BIGINT)
         AS log2_bucket,
       count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
WHERE n_chars > 0
GROUP BY source, log2_bucket
ORDER BY source, log2_bucket
"""


# ------------------------------------------------- windowed_topk_types

WINDOWED_TOPK = 3


def windowed_topk_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: top-3 types per DAY by event count —
    the dashboard query every event pipeline ships. One grouped pass
    to (day, type) counts, then a rank window PARTITIONED BY DAY
    (parallel across days; each day's frame is type-cardinality)."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy(F.to_date("ts").alias("day"),
                        F.col("event_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("day").orderBy(F.desc("n"),
                                          F.asc("event_type"))
    return (daily.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= WINDOWED_TOPK)
            .select("day", F.col("rk").cast("int").alias("rk"),
                    "event_type", "n")
            .orderBy("day", "rk"))


WINDOWED_TOPK_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT day, event_type, n,
         CAST(row_number() OVER (PARTITION BY day
                                 ORDER BY n DESC, event_type ASC)
              AS INT) AS rk
  FROM daily)
SELECT day, rk, event_type, n FROM ranked
WHERE rk <= {WINDOWED_TOPK}
ORDER BY day, rk
"""


# ------------------------------------------------------- embedding_pq

PQ_M = 8          # subspaces (64-dim -> 8 x 8)
PQ_K = 16         # codewords per subspace
PQ_DIM = 64


def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (the FAISS IVF-PQ storage layout): each
    vector splits into PQ_M subvectors; each subvector is encoded as
    its nearest of PQ_K codewords, so a 64-float vector compresses to
    8 bytes. Codebooks here are the smallest-id corpus rows'
    subvectors (the reproducible-quantizer trick the IVF oracle uses
    — a k-means codebook swaps in at scale without changing the
    plan). Encoding is one Arrow-batched mapInPandas (numpy matmul
    per batch, no shuffle); output per vector: the integer code
    checksum (base-31 positional hash — exact) and the reconstruction
    MSE. Distances use the decomposed |a|^2 - 2ab + |b|^2 form with
    the same evaluation order as the SQL oracle, so the argmin (id
    tie-break) is engine-identical."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load_table(spark, "embeddings", sf_dir)
    base = (emb.orderBy("vec_id").limit(PQ_K)
            .select("embedding").collect())
    books = np.array([r["embedding"] for r in base],
                     dtype=np.float64)           # [K, DIM]
    d = PQ_DIM // PQ_M
    # books[m][k] = codeword k of subspace m
    sub_books = books.reshape(PQ_K, PQ_M, d).transpose(1, 0, 2)
    bc = spark.sparkContext.broadcast(sub_books)

    place = (31 ** np.arange(PQ_M)).astype(np.int64)

    def encode(batches):
        sb = bc.value                              # [M, K, d]
        c2 = np.einsum("mkd,mkd->mk", sb, sb)      # [M, K]
        for pdf in batches:
            vecs = np.stack(pdf["embedding"].to_numpy()) \
                .astype(np.float64).reshape(-1, PQ_M, d)
            # whole-batch distances — vectorized, not per-row Python
            # (the loop form measured exactly linear but 10x slower
            # at sf1). Each term is a d=8 sequential dot, the same
            # order DuckDB's list_dot_product uses, so the doubles —
            # and therefore the argmin and the mse — stay
            # engine-identical.
            v2 = np.einsum("nmd,nmd->nm", vecs, vecs)      # [n, M]
            cross = np.einsum("nmd,mkd->nmk", vecs, sb)    # [n, M, K]
            dists = v2[:, :, None] - 2.0 * cross + c2[None]
            codes = dists.argmin(axis=2)           # first min = id tie
            best = np.take_along_axis(
                dists, codes[:, :, None], axis=2)[:, :, 0]
            # accumulate the 8 per-subspace distances SEQUENTIALLY
            # (vectorized across rows) — numpy's pairwise .sum() order
            # is not bitwise-equal to the oracle's left-to-right
            # w0.dist + w1.dist + ... chain
            total = best[:, 0].copy()
            for m in range(1, PQ_M):
                total += best[:, m]
            mse = np.round(total / PQ_DIM, 4)
            ck = ((codes + 1) * place[None, :]).sum(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "code_checksum": ck.astype(np.int64),
                "recon_mse": mse,
            })

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("code_checksum", T.LongType()),
        T.StructField("recon_mse", T.DoubleType()),
    ])
    return (emb.select("vec_id", "embedding")
            .mapInPandas(encode, schema=schema)
            .orderBy("vec_id"))


def _pq_oracle() -> str:
    d = PQ_DIM // PQ_M
    subs = []
    for m in range(PQ_M):
        lo, hi = m * d + 1, (m + 1) * d
        subs.append(f"e[{lo}:{hi}] AS s{m}")
    sub_sel = ", ".join(subs)
    per_sub = []
    for m in range(PQ_M):
        per_sub.append(f"""
d{m} AS (
  SELECT v.vec_id, c.k,
         list_dot_product(v.s{m}, v.s{m})
         - 2.0 * list_dot_product(v.s{m}, c.s{m})
         + list_dot_product(c.s{m}, c.s{m}) AS dist
  FROM v JOIN cents c ON TRUE),
b{m} AS (
  SELECT vec_id, k AS code, dist,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist ASC, k ASC) AS rn
  FROM d{m})""")
    joins = " ".join(
        f"JOIN (SELECT vec_id, code, dist FROM b{m} WHERE rn = 1) "
        f"w{m} USING (vec_id)" for m in range(PQ_M))
    checksum = " + ".join(f"(w{m}.code + 1) * {31 ** m}"
                          for m in range(PQ_M))
    total = " + ".join(f"w{m}.dist" for m in range(PQ_M))
    return f"""
WITH raw AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
v AS (SELECT vec_id, {sub_sel} FROM raw),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, {sub_sel}
  FROM (SELECT * FROM raw ORDER BY vec_id LIMIT {PQ_K})),
{",".join(per_sub)}
SELECT r.vec_id,
       CAST({checksum} AS BIGINT) AS code_checksum,
       round(({total}) / {PQ_DIM}, 4) AS recon_mse
FROM raw r {joins}
ORDER BY r.vec_id
"""


QUERIES.update({
    "boilerplate_prefix_groups": boilerplate_prefix_groups,
    "length_log_histogram": length_log_histogram,
    "windowed_topk_types": windowed_topk_types,
    "embedding_pq": embedding_pq,
})
ORACLES.update({
    "boilerplate_prefix_groups": BOILERPLATE_PREFIX_ORACLE,
    "length_log_histogram": LENGTH_LOG_HISTOGRAM_ORACLE,
    "windowed_topk_types": WINDOWED_TOPK_ORACLE,
    "embedding_pq": _pq_oracle(),
})
