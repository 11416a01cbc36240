"""Bucketed co-located join: same results as the plain join, with the
join-side Exchanges eliminated from the physical plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from parquet_generator_spark.sinks.bucketed import bucketed_join, write_bucketed
from parquet_generator_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


def test_bucketed_join_no_exchange(spark, tmp_path):
    li = load_table(spark, "lineitem", SF_DIR)
    orders = load_table(spark, "orders", SF_DIR).withColumnRenamed(
        "o_orderkey", "l_orderkey")

    write_bucketed(li, "li_bkt", "l_orderkey", N_BUCKETS,
                   path=str(tmp_path / "li_bkt"))
    write_bucketed(orders, "ord_bkt", "l_orderkey", N_BUCKETS,
                   path=str(tmp_path / "ord_bkt"))
    try:
        joined = bucketed_join(spark, "li_bkt", "ord_bkt", "l_orderkey")

        # value identity with the plain join
        assert joined.count() == li.join(orders, "l_orderkey").count()

        # plan shape: bucketed scans feed the join with NO exchange.
        # (autoBroadcastJoinThreshold would turn this into a broadcast
        # join at tiny SF and hide the property, so disable it here.)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                bucketed_join(spark, "li_bkt", "ord_bkt",
                              "l_orderkey").explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))

        # and the aggregation on the bucket key reuses the layout too
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                (spark.table("li_bkt").groupBy("l_orderkey")
                 .agg(F.sum("l_quantity")).explain("formatted"))
            agg_plan = buf.getvalue()
            assert "Exchange" not in agg_plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                           str(64 * 1024 * 1024))
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")
