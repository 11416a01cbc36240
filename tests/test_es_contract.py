"""Contract test for the slice-parallel ES scroll reader.

The sandbox has no Elasticsearch, so a localhost ThreadingHTTPServer
speaks the exact wire protocol the reader depends on (the same
surface EsParquetWriter.java:62-98 exercises against a live
cluster): POST /{index}/_search?scroll=... with a slice body opens a
sliced cursor, POST /_search/scroll pages it, an empty hits page
ends it. This verifies the reader's real HTTP path — request shape,
slice fan-out, scroll continuation, termination — not the JSON
fixture shortcut.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import types as T

from parquet_generator_spark.sources.es_source import (
    EsSourceConfig,
    read_elasticsearch,
)

N_DOCS = 50
N_SLICES = 4
BATCH = 3


def _make_docs():
    docs = []
    for i in range(N_DOCS):
        d = {"id": i, "name": f"doc-{i}"}
        if i % 5 != 0:          # every 5th doc is missing 'sev'
            d["sev"] = i % 7
        docs.append(d)
    return docs


class _FakeEs(BaseHTTPRequestHandler):
    """Minimal sliced-scroll ES: slice s serves docs with
    id % max == s, BATCH docs per page."""

    docs = _make_docs()
    cursors: dict = {}            # scroll_id -> (slice_id, offset)
    lock = threading.Lock()
    seen_paths: list = []
    counter = [0]

    def do_POST(self):              # noqa: N802  (stdlib naming)
        body = json.loads(self.rfile.read(
            int(self.headers["Content-Length"])))
        with self.lock:
            self.seen_paths.append(self.path)
        if re.match(r"^/.+/_search\?scroll=", self.path):
            sl = body["slice"]
            mine = [d for d in self.docs
                    if d["id"] % sl["max"] == sl["id"]]
            self._page(sl["id"], 0, mine)
        elif self.path.startswith("/_search/scroll"):
            with self.lock:
                slice_id, offset = self.cursors[body["scroll_id"]]
            mine = [d for d in self.docs
                    if d["id"] % N_SLICES == slice_id]
            self._page(slice_id, offset, mine)
        else:
            self.send_error(404)

    def _page(self, slice_id, offset, mine):
        page = mine[offset:offset + BATCH]
        with self.lock:
            self.counter[0] += 1
            sid = f"cursor-{self.counter[0]}"
            self.cursors[sid] = (slice_id, offset + BATCH)
        out = json.dumps({
            "_scroll_id": sid,
            "hits": {"hits": [{"_source": d} for d in page]},
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):       # keep pytest output clean
        pass


@pytest.fixture()
def fake_es():
    _FakeEs.seen_paths.clear()
    _FakeEs.cursors.clear()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeEs)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


def test_sliced_scroll_reads_every_doc_once(spark, fake_es):
    cfg = EsSourceConfig(host="127.0.0.1", port=fake_es,
                         index="security-events",
                         batch_size=BATCH, n_slices=N_SLICES)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("sev", T.LongType()),
    ])
    rows = read_elasticsearch(spark, cfg, schema).collect()

    # every doc exactly once across all slices
    assert sorted(r["id"] for r in rows) == list(range(N_DOCS))
    # lenient decode: docs without 'sev' land as null, not an error
    by_id = {r["id"]: r for r in rows}
    assert by_id[10]["sev"] is None and by_id[11]["sev"] == 11 % 7
    # the reader opened one sliced cursor per slice and paged via
    # the scroll endpoint (contract with EsParquetWriter.java:62-98)
    opens = [p for p in _FakeEs.seen_paths
             if p.startswith("/security-events/_search?scroll=")]
    pages = [p for p in _FakeEs.seen_paths
             if p.startswith("/_search/scroll")]
    assert len(opens) == N_SLICES
    assert len(pages) >= N_SLICES     # at least one continuation each


def test_doc_type_in_path(spark, fake_es):
    """Pre-7.x _type addressing (the reference targets 5.x/6.x
    clusters) must appear in the search path."""
    cfg = EsSourceConfig(host="127.0.0.1", port=fake_es,
                         index="netflow", doc_type="flow",
                         batch_size=BATCH, n_slices=N_SLICES)
    schema = T.StructType([T.StructField("id", T.LongType())])
    rows = read_elasticsearch(spark, cfg, schema).collect()
    assert len(rows) == N_DOCS
    assert any(p.startswith("/netflow/flow/_search?scroll=")
               for p in _FakeEs.seen_paths)
