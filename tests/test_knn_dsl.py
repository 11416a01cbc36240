"""ES `knn` search section: filtered-kNN contract, exactness at
n_probe = n_cells, and the no-join/no-broadcast plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_generator_spark.operators import esdsl, similarity

N, DIM = 120, 8
QV = [round(float(np.sin(0.5 * i + 0.1)), 4) for i in range(DIM)]


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(DIM)], int(i % 7))
            for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def _knn(emb, **kw):
    body = {"field": "embedding", "query_vector": QV, "k": 5,
            "n_cells": 16, "n_probe": 16, **kw}
    return esdsl.search(emb, {"knn": body})


def test_knn_exact_at_full_probe_matches_bruteforce(emb):
    got = _knn(emb).collect()
    # brute force against the same literal
    qv = np.array(QV)
    rows = emb.collect()
    cos = sorted(
        ((round(float(np.dot(r["embedding"], qv)
                      / (np.linalg.norm(r["embedding"])
                         * np.linalg.norm(qv))), 4), r["vec_id"])
         for r in rows),
        key=lambda t: (-t[0], t[1]))[:5]
    assert [(r["vec_id"], r["cos"]) for r in got] == \
        [(vid, c) for c, vid in cos]
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]


def test_knn_filter_is_pre_filter(emb):
    got = _knn(emb, filter={"range": {"label": {"gte": 5}}}).collect()
    assert len(got) == 5
    labels = {r["label"] for r in emb.collect() if r["vec_id"] in
              {g["vec_id"] for g in got}}
    assert labels <= {5, 6}


def test_knn_plan_has_no_join_or_corpus_broadcast(emb):
    plan = _knn(emb, n_probe=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_knn_probe_subsets_cells(emb):
    # fewer probes -> candidate subset -> results still k-long and a
    # subset-consistent prefix ordering (scores non-increasing)
    got = _knn(emb, n_probe=2).collect()
    assert len(got) == 5
    scores = [r["cos"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_knn_duck_sql_mirror(emb):
    import duckdb

    cents = similarity.make_centroids_from_corpus(emb, 16)
    spark_res = [(r["rank"], r["vec_id"], r["cos"])
                 for r in similarity.knn_literal_topk(
                     emb, QV, 5, cents, n_probe=3,
                     pre_filter=F.col("label") >= 2).collect()]
    con = duckdb.connect()
    pdf = emb.toPandas()
    pdf["embedding"] = pdf["embedding"].map(list)
    con.register("embeddings", pdf)
    duck_res = con.execute(similarity.knn_literal_topk_duck_sql(
        "embeddings", QV, 5, 16, 3,
        pre_filter_sql="label >= 2")).fetchall()
    assert spark_res == [tuple(r) for r in duck_res]
