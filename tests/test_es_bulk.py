"""ES _bulk NDJSON export: framing, _id mapping, JSON validity,
round-trip of the source documents, and the per-file request bound."""

from __future__ import annotations

import glob
import json

from parquet_generator_spark.sinks.es_bulk import (
    to_bulk_lines,
    write_bulk_export,
)
from parquet_generator_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _read_lines(path: str) -> list[str]:
    lines: list[str] = []
    for f in sorted(glob.glob(f"{path}/part-*")):
        with open(f) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    return lines


def test_bulk_framing_and_round_trip(spark, tmp_path):
    docs = load_table(spark, "documents", SF).limit(50)
    out = str(tmp_path / "bulk")
    n_files = write_bulk_export(docs, out, index="docs",
                                id_col="doc_id", docs_per_file=20)
    assert n_files == 3  # ceil(50 / 20)

    lines = _read_lines(out)
    assert len(lines) == 100  # two lines per doc
    originals = {r["doc_id"]: r.asDict() for r in docs.collect()}
    seen = {}
    for action_ln, source_ln in zip(lines[0::2], lines[1::2]):
        action = json.loads(action_ln)
        src = json.loads(source_ln)
        assert action["index"]["_index"] == "docs"
        did = int(action["index"]["_id"])
        assert src["doc_id"] == did  # _id mirrors the key column
        seen[did] = src
    assert set(seen) == set(originals)
    for did, src in seen.items():
        assert src["text"] == originals[did]["text"]
        assert src["source"] == originals[did]["source"]


def test_bulk_timestamps_are_iso8601(spark, tmp_path):
    ev = load_table(spark, "events", SF).limit(5)
    lines = [r["value"] for r in
             to_bulk_lines(ev, "events", "event_id").collect()]
    for stanza in lines:
        src = json.loads(stanza.split("\n", 1)[1])
        # ES default date parsing accepts strict ISO-8601
        assert "T" in src["ts"] and src["ts"].endswith("Z") \
            or "+" in src["ts"]


def test_file_count_bounds_request_size(spark, tmp_path):
    docs = load_table(spark, "documents", SF).limit(30)
    out = str(tmp_path / "bulk2")
    write_bulk_export(docs, out, index="d", id_col="doc_id",
                      docs_per_file=7)
    for f in sorted(glob.glob(f"{out}/part-*")):
        with open(f) as fh:
            n_lines = len([ln for ln in fh.read().splitlines() if ln])
        assert n_lines % 2 == 0
        # round-robin spreads evenly; no file may exceed the cap
        assert n_lines // 2 <= 7
