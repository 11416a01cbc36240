"""CSV / ORC source-sink round-trips: values survive exactly, and the
ORC scan keeps pushdown + pruning."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table
from parquet_generator_spark.sources.formats import (
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)

SF = "/root/testdata/sf0.001"


def _checksum(df):
    return tuple(df.agg(
        F.count(F.lit(1)),
        F.sum("o_orderkey"),
        F.round(F.sum("o_totalprice"), 2),
        F.count(F.when(F.col("o_orderstatus") == "O", 1))).collect()[0])


def test_csv_roundtrip_preserves_values(spark, tmp_path):
    orders = load_table(spark, "orders", SF)
    write_csv(orders, str(tmp_path / "orders_csv"))
    back = read_csv(spark, str(tmp_path / "orders_csv"), orders.schema)
    assert back.schema == orders.schema
    assert _checksum(back) == _checksum(orders)


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    orders = load_table(spark, "orders", SF)
    write_orc(orders, str(tmp_path / "orders_orc"))
    back = read_orc(spark, str(tmp_path / "orders_orc"))
    assert _checksum(back) == _checksum(orders)

    q = (back.filter(F.col("o_totalprice") > 1000.0)
         .select("o_orderkey", "o_totalprice"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThan(o_totalprice,1000.0)" in plan  # pushed filter
    assert "o_orderdate" not in plan.split("ReadSchema:")[1]  # pruned
