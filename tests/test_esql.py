"""ES|QL subset: parse/render parity, expression fences, and
command fences."""

from __future__ import annotations

import duckdb
import pytest

from parquet_generator_spark.operators.esql import (
    esql_df,
    esql_duck_sql,
    parse_esql,
)

SF = "/root/testdata/sf0.001"


def _duck(sf=SF):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con


def _run_both(spark, q):
    from parquet_generator_spark.sources.catalog import load_table

    plan = parse_esql(q)
    sdf = esql_df(load_table(spark, plan.table, SF), plan)
    srows = sorted(tuple(r) for r in sdf.collect())
    drows = sorted(tuple(r) for r in
                   _duck().execute(esql_duck_sql(plan)).fetchall())
    return srows, drows, sdf.columns


def test_full_pipeline_matches(spark):
    q = ("FROM events | WHERE value >= 50 | EVAL b = user_id % 3 "
         "| STATS n = COUNT(*), u = COUNT_DISTINCT(user_id) "
         "BY event_type, b | SORT event_type, b | LIMIT 50")
    s, d, cols = _run_both(spark, q)
    assert s == d and len(s) > 0
    assert cols == ["event_type", "b", "n", "u"]


def test_no_stats_projection_pipeline(spark):
    q = ("FROM events | WHERE event_type == \"purchase\" "
         "AND value > 95 | EVAL tag = CONCAT(event_type, \"!\") "
         "| SORT event_id | KEEP event_id, tag | LIMIT 10")
    s, d, cols = _run_both(spark, q)
    assert s == d and cols == ["event_id", "tag"]
    assert all(r[1] == "purchase!" for r in s)


def test_global_stats_without_by(spark):
    q = "FROM events | STATS n = COUNT(*), mx = MAX(value)"
    s, d, _ = _run_both(spark, q)
    assert s == d and len(s) == 1


def test_fences_raise_loudly():
    with pytest.raises(ValueError, match="must start with FROM"):
        parse_esql("WHERE x == 1")
    with pytest.raises(ValueError, match="GROK is not supported"):
        parse_esql("FROM events | GROK msg \"%{IP:ip}\"")
    with pytest.raises(ValueError, match="WHERE after STATS"):
        parse_esql("FROM events | STATS n = COUNT(*) | WHERE n > 1")
    with pytest.raises(ValueError, match="unsupported syntax"):
        parse_esql("FROM events | WHERE value ~= 3")
    with pytest.raises(ValueError, match="aggregate SUM outside"):
        parse_esql("FROM events | EVAL s = SUM(value)")
    with pytest.raises(ValueError, match="unsupported aggregate"):
        parse_esql("FROM events | STATS p = PERCENTILE(value, 95)")


def test_expression_translation():
    plan = parse_esql(
        'FROM events | WHERE a == "x\'y" AND b != 2 | LIMIT 1')
    assert plan.wheres == ["( a = 'x''y' AND b <> 2 )"
                           .replace("( ", "").replace(" )", "")] or \
        "a = 'x''y' AND b <> 2" in plan.wheres[0]
