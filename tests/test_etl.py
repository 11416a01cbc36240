"""End-to-end ETL pipeline tests mirroring the reference flow on its
own fixtures (read-only) and on synthetic JSON docs."""

from __future__ import annotations

import json
import os
from datetime import date

import pytest
from pyspark.sql import functions as F

from parquet_generator_spark.etl import (
    dated_parquet_to_parquet,
    discover_rules,
    json_docs_to_parquet,
)
from parquet_generator_spark.schema.avro_io import avro_to_struct
from parquet_generator_spark.sources.dated import (
    parse_dated_name,
    recent_n_days,
)
from parquet_generator_spark.sources.es_source import read_json_fixture
from parquet_generator_spark.schema.infer import infer_json_schema

REF_DIR = "/root/reference/office365_signin"


def test_dated_discovery_matches_reference_fixture():
    names = [n for n in os.listdir(REF_DIR) if not n.startswith(".")]
    got = recent_n_days(names, "event_", 7, date(2019, 10, 3))
    # event_516411130 is not a date and must be skipped; 20190927 is
    # 6 days before 20191003 so all six dated files are in range
    assert [n for _, n in got] == [
        "event_20190927", "event_20190929", "event_20190930",
        "event_20191001", "event_20191002", "event_20191003"]
    assert parse_dated_name("event_516411130", "event_") is None


@pytest.fixture(scope="module")
def dated_fixture_dir(spark, tmp_path_factory):
    """Reference-shaped dated source dirs (event_YYYYMMDD) — the
    real reference fixtures are zero-byte stubs, so synthesize the
    same layout: per-day parquet with a rule_name column."""
    base = tmp_path_factory.mktemp("es_like")
    for day in ("20191001", "20191002", "20191003"):
        rows = [(f"doc{day}{i}",
                 "office365_signin" if i % 3 else "other-rule",
                 i) for i in range(30)]
        (spark.createDataFrame(rows, "msg string, rule_name string, sev int")
         .coalesce(1).write.parquet(str(base / f"event_{day}")))
    # a non-dated entry that discovery must skip
    (base / "event_516411130").mkdir()
    return str(base)


def test_discover_rules_terms_agg(spark, dated_fixture_dir):
    df = spark.read.parquet(f"{dated_fixture_dir}/event_20191002")
    rules = discover_rules(df, "rule_name").collect()
    assert [(r["key"], r["doc_count"]) for r in rules] == [
        ("office365_signin", 20), ("other-rule", 10)]
    assert set(rules[0].asDict()) == {"key", "doc_count"}


def test_dated_parquet_pipeline_end_to_end(spark, tmp_path,
                                           dated_fixture_dir):
    rule = "office365_signin"
    out = dated_parquet_to_parquet(
        spark, dated_fixture_dir, "event_", 7, date(2019, 10, 3),
        rule, str(tmp_path))
    written = spark.read.parquet(out)
    assert written.count() > 0
    assert "source_date" in written.columns
    # partitioned layout: one directory per source date
    parts = [d for d in os.listdir(out) if d.startswith("source_date=")]
    assert len(parts) >= 2
    # schema sidecar parses and covers the data columns
    with open(os.path.join(out, "_schema.asvc")) as fh:
        struct = avro_to_struct(fh.read())
    assert {f.name for f in struct.fields} == set(written.columns)
    # every surviving row matches the rule phrase
    assert written.filter(F.col("rule_name") == rule).count() \
        == written.count()


def test_json_docs_pipeline(spark, tmp_path):
    docs = [
        {"rule_name": "login-anomaly", "sev": i % 3,
         "msg": f"event {i}", "extra": "x" if i % 2 else None}
        for i in range(50)
    ] + [
        {"rule_name": "other-rule", "sev": 9, "msg": "noise"}
    ]
    rows = [(json.dumps(d), f"2024-01-{(i % 3) + 1:02d}")
            for i, d in enumerate(docs)]
    docs_df = spark.createDataFrame(rows, "doc string, source_date string")
    out = json_docs_to_parquet(
        spark, docs_df, "login-anomaly", str(tmp_path), sample_ratio=1.0)
    written = spark.read.parquet(out)
    assert written.count() == 50
    assert set(written.columns) >= {"rule_name", "sev", "msg", "source_date"}


def test_fixture_reader_lenient_decode(spark, tmp_path):
    p = tmp_path / "hits.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2}\n{"b": "y", "c": true}\n')
    schema = infer_json_schema(
        spark, ['{"a": 1, "b": "x"}', '{"c": true}'])
    df = read_json_fixture(spark, str(p), schema)
    rows = {tuple(r) for r in df.select("a", "b", "c").collect()}
    # missing fields decode to null, never error (ExtendedJsonDecoder
    # behavior)
    assert (2, None, None) in rows and (None, "y", True) in rows
