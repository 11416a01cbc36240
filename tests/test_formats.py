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


def test_jsonl_roundtrip_and_leniency(spark, tmp_path):
    """JSONL round-trip preserves values (incl. a timestamp and an
    array column), and a malformed line degrades to nulls instead of
    failing the read."""
    from parquet_generator_spark.sources.formats import (
        read_jsonl,
        write_jsonl,
    )

    df = spark.createDataFrame(
        [(1, "a b c", 1.5, ["x", "y"]),
         (2, None, -0.25, []),
         (3, "zzz", 0.0, ["q"])],
        "doc_id long, text string, score double, tags array<string>")
    out = tmp_path / "docs_jsonl"
    write_jsonl(df, str(out))

    back = read_jsonl(spark, str(out), df.schema)
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))

    # gzip by default (the training-stack handoff convention)
    import glob
    assert glob.glob(str(out / "*.json.gz"))

    # malformed line -> nulls, not a crash
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "score": 1.0, "tags": []}\n'
        'not json at all\n')
    rows = read_jsonl(spark, str(bad), df.schema).collect()
    assert len(rows) == 2
    assert {r["doc_id"] for r in rows} == {1, None}
