"""CLI parity with the reference's Bootstrap flow: discover lists the
terms-agg rule table; export writes per-date parquet + the
schema.asvc sidecar for the chosen rule (non-interactive equivalent
of the readline loop, Bootstrap.java:87-154)."""

from __future__ import annotations

import json
import os

from parquet_generator_spark.cli import main

DOCS = [
    ("20240101", {"rule_name": "office365-signin", "user": "a",
                  "n": 1}),
    ("20240101", {"rule_name": "office365-signin", "user": "b",
                  "n": 2}),
    ("20240102", {"rule_name": "vpn-logs", "user": "c", "n": 3}),
    ("20240102", {"rule_name": "office365-signin", "user": "d"}),
]


def _write_source(spark, tmp_path) -> str:
    df = spark.createDataFrame(
        [(d, json.dumps(doc)) for d, doc in DOCS],
        "source_date string, doc string")
    path = str(tmp_path / "raw.parquet")
    df.write.mode("overwrite").parquet(path)
    return path


def test_cli_discover_lists_rules(spark, tmp_path, capsys):
    src = _write_source(spark, tmp_path)
    rc = main(["discover", "--source", src, "--sample-ratio", "1.0"],
              spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "office365-signin" in out and "3" in out
    assert "vpn-logs" in out


def test_cli_discover_jsonl_honors_doc_column(spark, tmp_path,
                                              capsys):
    """A .jsonl source lands under the caller's --doc-column name,
    so discover decodes it instead of silently skipping (the rename
    used to hardcode 'doc')."""
    src = tmp_path / "raw.jsonl"
    src.write_text("\n".join(json.dumps(doc) for _, doc in DOCS))
    rc = main(["discover", "--source", str(src),
               "--doc-column", "payload", "--sample-ratio", "1.0"],
              spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "office365-signin" in out and "3" in out
    assert "vpn-logs" in out


def test_cli_export_writes_parquet_and_sidecar(spark, tmp_path,
                                               capsys):
    src = _write_source(spark, tmp_path)
    out_dir = str(tmp_path / "out")
    rc = main(["export", "--source", src,
               "--rule", "office365-signin", "--out", out_dir,
               "--sample-ratio", "1.0"], spark=spark)
    assert rc == 0
    ds = capsys.readouterr().out.strip()
    got = spark.read.parquet(ds)
    assert got.count() == 3                       # rule filter applied
    assert "source_date" in got.columns           # partition survives
    # missing field decoded leniently to null (ExtendedJsonDecoder)
    assert got.filter("n IS NULL").count() == 1
    assert os.path.exists(os.path.join(ds, "_schema.asvc"))
    avro = json.load(open(os.path.join(ds, "_schema.asvc")))
    assert avro["type"] == "record"
    # every field nullable-promoted (Bootstrap enableDefaultValue)
    for f in avro["fields"]:
        assert f["type"][0] == "null" or f["type"] == "null", f
