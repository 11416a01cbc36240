"""Property tests: the salted (skew-proof) aggregation and join are
value-identical to their plain equivalents on arbitrary skewed
inputs — salting may only change physical distribution, never
results."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parquet_generator_spark.operators.skew import salted_agg, salted_join

# few distinct keys + many rows = naturally skewed
rows_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=-100, max_value=100)),
    min_size=1, max_size=60)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_salted_agg_equals_plain_groupby(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    got = {(r["k"], r["n"], r["s"])
           for r in salted_agg(df, "k", "v",
                               {"n": F.count(F.lit(1)),
                                "s": F.sum("v")},
                               n_salt=4).collect()}
    want = {(r["k"], r["n"], r["s"])
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("v").alias("s")).collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=rows_strategy)
def test_salted_join_equals_plain_join(spark, rows):
    fact = spark.createDataFrame(rows, "k long, v long")
    dim = spark.createDataFrame(
        [(k, f"attr{k}") for k in range(4)], "k long, attr string")
    got = Counter((r["k"], r["v"], r["attr"])
                  for r in salted_join(fact, dim, "k", "v",
                                       n_salt=3).collect())
    want = Counter((r["k"], r["v"], r["attr"])
                   for r in fact.join(dim, "k").collect())
    assert got == want
