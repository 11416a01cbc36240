"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. Expressed with
  zip_with/aggregate so the arithmetic stays in the JVM; the
  query-set side is broadcast, so the plan is a single pass over the
  corpus with no shuffle (then a small top-k per query).
- Random-hyperplane LSH: the scale path. Hyperplanes are literal
  arrays baked into the plan (deterministic, seed=7), bucketing is a
  JVM expression; candidate generation shuffles on the bucket key
  only. At 100 TB the bucketed variant turns O(N*Q) into
  O(N + sum(bucket^2)).
- Embedding near-dup pairs: same cosine kernel under a threshold.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(c) -> Column:
    return F.expr(f"transform({c}, x -> cast(x AS DOUBLE))") \
        if isinstance(c, str) else c


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x AS DOUBLE) * y), "
        f"cast(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def norm(a: str) -> Column:
    return F.sqrt(F.expr(
        f"aggregate({a}, cast(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + cast(x AS DOUBLE) * x)"))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


COSINE_DUCK = ("list_dot_product({a}, {b}) / "
               "sqrt(list_dot_product({a}, {a}) * "
               "list_dot_product({b}, {b}))")


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus
    is scanned once. Ties broken by neighbor id for determinism.
    """
    # norms are per-ROW, not per-pair: compute them once on each side
    # before the join (corpus norm would otherwise be re-evaluated
    # once per query — a |Q|x blowup of the aggregate expression)
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qvec"),
                       norm(vec_col).alias("qn"))
    c = corpus.select(F.col(id_col).alias("nid"),
                      F.col(vec_col).alias("nvec"),
                      norm(vec_col).alias("nn"))
    scored = (c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
              .select("qid", "nid",
                      F.round(dot("qvec", "nvec")
                              / (F.col("qn") * F.col("nn")), 4)
                      .alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("qid", "rank"))


def brute_force_topk_duck_sql(table: str, k: int, query_pred: str,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> str:
    # cast to DOUBLE[] so DuckDB accumulates in double like Spark does
    cos = COSINE_DUCK.format(a=f"CAST(q.{vec_col} AS DOUBLE[])",
                             b=f"CAST(c.{vec_col} AS DOUBLE[])")
    return f"""
WITH q AS (SELECT * FROM {table} WHERE {query_pred}),
scored AS (
  SELECT q.{id_col} AS qid, c.{id_col} AS nid,
         round({cos}, 4) AS cos
  FROM q, {table} c WHERE q.{id_col} != c.{id_col}),
ranked AS (
  SELECT qid, nid, cos,
         row_number() OVER (PARTITION BY qid
                            ORDER BY cos DESC, nid ASC) AS rank
  FROM scored)
SELECT qid, nid, cos, rank FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


# ------------------------------------------------------------------
# Random-hyperplane LSH
# ------------------------------------------------------------------

def make_hyperplanes(dim: int, n_planes: int = 16,
                     seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col: str, planes: np.ndarray) -> Column:
    """Bucket id = sign bits of the vector against each hyperplane.
    Plane coefficients are literals in the plan — shipped once with
    the task binary, not per row."""
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ", ".join(f"cast({x!r} AS DOUBLE)"
                                   for x in plane) + ")"
        d = (f"aggregate(zip_with({vec_col}, {arr}, "
             f"(x, y) -> cast(x AS DOUBLE) * y), cast(0.0 AS DOUBLE), "
             f"(acc, v) -> acc + v)")
        bits.append(f"(CASE WHEN {d} >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(bits)).cast("long")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int,
             planes: np.ndarray, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.
    Recall < 1 by construction; measured against brute force in
    tests/test_similarity.py."""
    bucket = lsh_bucket(vec_col, planes)
    c = corpus.select(F.col(id_col).alias("nid"),
                      F.col(vec_col).alias("nvec"),
                      norm(vec_col).alias("nn"),
                      bucket.alias("bucket"))
    q = queries.select(F.col(id_col).alias("qid"),
                       F.col(vec_col).alias("qvec"),
                       norm(vec_col).alias("qn"),
                       bucket.alias("bucket"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("qid") != F.col("nid"))
              .select("qid", "nid",
                      F.round(dot("qvec", "nvec")
                              / (F.col("qn") * F.col("nn")), 4)
                      .alias("cos")))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("qid", "rank"))


# ------------------------------------------------------------------
# IVF (inverted-file) ANN
# ------------------------------------------------------------------

def ivf_assign_cells(df: DataFrame, centroids: np.ndarray,
                     n_probe: int = 1, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Assign each vector its ``n_probe`` nearest coarse cells
    (cosine against the broadcast centroid matrix, one numpy matmul
    per Arrow batch inside mapInPandas — a narrow map, no shuffle).
    Output: (id, vec, cell) with one row per probed cell."""
    import pandas as pd

    spark = df.sparkSession
    cmat = centroids.astype(np.float64)
    cmat = cmat / np.sqrt((cmat * cmat).sum(axis=1))[:, None]
    bc = spark.sparkContext.broadcast(cmat)
    n_probe = min(n_probe, len(centroids))

    def assign(batches):
        cm = bc.value
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((vecs * vecs).sum(axis=1))
            sims = (vecs @ cm.T) / norms[:, None]
            # top n_probe cells per row, deterministic tie-break on
            # cell id via stable argsort of (-sim, cell)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy().repeat(n_probe),
                vec_col: [v for v in pdf[vec_col] for _ in range(n_probe)],
                "cell": order.reshape(-1),
                "probe_rank": np.tile(np.arange(n_probe), n),
            })

    out_schema = T.StructType(list(df.select(id_col, vec_col).schema)
                              + [T.StructField("cell", T.LongType()),
                                 T.StructField("probe_rank", T.LongType())])
    return df.select(id_col, vec_col).mapInPandas(assign, schema=out_schema)


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             centroids: np.ndarray, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single
    nearest cell; each query probes its n_probe nearest cells and
    ranks only those candidates. With n_probe = n_centroids this
    EXACTLY equals brute force (asserted in tests); recall at
    n_probe << n_centroids is the speed/recall dial. The cell join is
    a plain equi-join => shuffle on the cell id, skew-splittable."""
    c = (ivf_assign_cells(corpus, centroids, 1, id_col, vec_col)
         .select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"),
                 norm(vec_col).alias("nn"), "cell"))
    q = (ivf_assign_cells(queries, centroids, n_probe, id_col, vec_col)
         .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
                 norm(vec_col).alias("qn"), "cell"))
    scored = (c.join(F.broadcast(q), "cell")
              .filter(F.col("qid") != F.col("nid"))
              .select("qid", "nid",
                      F.round(dot("qvec", "nvec")
                              / (F.col("qn") * F.col("nn")), 4)
                      .alias("cos"))
              .dropDuplicates(["qid", "nid"]))
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("qid", "rank"))


def make_centroids_from_corpus(df: DataFrame, n_centroids: int,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> np.ndarray:
    """Deterministic coarse quantizer: the n_centroids vectors with
    the smallest ids (a fixed sample stands in for k-means; at scale
    run a few Lloyd iterations on a sample and broadcast the result —
    the query plan is identical either way)."""
    rows = (df.orderBy(id_col).limit(n_centroids)
            .select(vec_col).collect())
    return np.array([r[0] for r in rows], dtype=np.float64)


def make_centroids_kmeans(df: DataFrame, n_centroids: int,
                          n_iter: int = 5, sample_size: int = 4096,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> np.ndarray:
    """Spherical k-means coarse quantizer: Lloyd iterations on a
    deterministic bounded sample (smallest ids), driver-side numpy.
    Centroid quality only affects recall, never correctness — the
    cell assignment downstream is the same plan. At 100 TB the sample
    collect is the only driver-side data (sample_size rows), and the
    result ships to executors as a broadcast literal."""
    rows = (df.orderBy(id_col).limit(sample_size)
            .select(vec_col).collect())
    x = np.array([r[0] for r in rows], dtype=np.float64)
    x = x / np.sqrt((x * x).sum(axis=1))[:, None]
    cents = x[:n_centroids].copy()
    for _ in range(n_iter):
        cents_n = cents / np.sqrt((cents * cents).sum(axis=1))[:, None]
        assign = (x @ cents_n.T).argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def embedding_dup_pairs(df: DataFrame, threshold: float,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= threshold).

    All-pairs form — the correctness baseline; at scale, pre-bucket
    with lsh_bucket and join on the bucket first. Execution: the
    corpus matrix is broadcast (same pattern as a broadcast-hash
    join: small side ships once per executor) and each partition
    computes its block of the similarity matrix with one float64
    numpy matmul inside mapInPandas — the classic block-distributed
    GEMM, no shuffle at all. The final round+threshold stays in the
    JVM so HALF_UP rounding semantics match the SQL oracle exactly;
    numpy only pre-filters with a small epsilon margin.
    """
    import pandas as pd

    spark = df.sparkSession
    pdf = df.select(F.col(id_col), F.col(vec_col)).toPandas()
    ids = pdf[id_col].to_numpy(dtype=np.int64)
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))
    # round(cos, 4) >= threshold admits raw values from half a
    # rounding step below the threshold — the numpy pre-filter must
    # keep those (plus an fp epsilon); the JVM round+filter decides.
    margin = threshold - 0.5e-4 - 1e-9

    def block_scores(batches):
        all_ids, all_mat, all_norms = bc.value
        for chunk in batches:
            a_ids = chunk[id_col].to_numpy(dtype=np.int64)
            a_mat = np.stack(chunk[vec_col].to_numpy()).astype(np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            cos = (a_mat @ all_mat.T) / (a_norms[:, None] * all_norms[None, :])
            keep = (a_ids[:, None] < all_ids[None, :]) & (cos >= margin)
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame({"id_a": a_ids[ai], "id_b": all_ids[bi],
                                "cos_raw": cos[ai, bi]})

    pairs = df.select(id_col, vec_col).mapInPandas(
        block_scores, schema="id_a bigint, id_b bigint, cos_raw double")
    return (pairs.select("id_a", "id_b",
                         F.round("cos_raw", 4).alias("cos"))
            .filter(F.col("cos") >= threshold)
            .orderBy("id_a", "id_b"))


def embedding_dup_pairs_duck_sql(table: str, threshold: float,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> str:
    cos = COSINE_DUCK.format(a=f"CAST(a.{vec_col} AS DOUBLE[])",
                             b=f"CAST(b.{vec_col} AS DOUBLE[])")
    return f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       round({cos}, 4) AS cos
FROM {table} a, {table} b
WHERE a.{id_col} < b.{id_col}
  AND round({cos}, 4) >= {threshold}
ORDER BY id_a, id_b
"""
