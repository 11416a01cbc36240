"""The literal-query cosine kernel's zero-vector NULL guard (the
esql_knn convention applied to the shared ann/rrf/hybrid kernel in
round 13) and the corpus precondition it documents."""

from __future__ import annotations

import duckdb
import pytest

from parquet_generator_spark.operators.similarity import (
    cosine_to_literal,
    cosine_to_literal_duck_sql,
)

_QV = [1.0, 2.0, 2.0]


def test_zero_vector_scores_null_in_both_engines(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [3.0, 0.0, 4.0]), (2, [0.0, 0.0, 0.0])],
        ["id", "v"])
    got = {r["id"]: r["c"] for r in df.select(
        "id", cosine_to_literal("v", _QV).alias("c")).collect()}
    assert got[1] is not None and got[2] is None

    con = duckdb.connect()
    sql = cosine_to_literal_duck_sql("v", _QV)
    duck = dict(con.execute(
        f"SELECT id, {sql} FROM (VALUES "
        f"(1, [3.0, 0.0, 4.0]::DOUBLE[]), "
        f"(2, [0.0, 0.0, 0.0]::DOUBLE[])) t(id, v)").fetchall())
    assert duck[1] == pytest.approx(got[1])
    assert duck[2] is None


def test_null_sorts_last_not_first(spark):
    """The failure the guard prevents: unguarded, Spark's NaN would
    rank the zero vector FIRST under desc; NULL ranks it last under
    the desc_nulls_last every ranking leg uses."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [3.0, 0.0, 4.0]), (2, [0.0, 0.0, 0.0]),
         (3, [-1.0, -2.0, -2.0])], ["id", "v"])
    ranked = (df.select("id",
                        cosine_to_literal("v", _QV).alias("c"))
              .orderBy(F.desc_nulls_last("c"), F.asc("id")))
    assert [r["id"] for r in ranked.collect()] == [1, 3, 2]


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_corpus_has_no_zero_vectors(sf):
    """The pinned precondition: the driver corpus never exercises
    the guard, so adding it changed no key's values (the guard is a
    real-corpus contract — padding rows, failed encoders)."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM "
        f"read_parquet('/root/testdata/{sf}/embeddings.parquet') "
        f"WHERE list_dot_product(embedding, embedding) <= 0"
    ).fetchone()[0]
    assert n == 0
