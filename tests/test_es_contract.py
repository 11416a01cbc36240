"""Contract test for the slice-parallel ES scroll reader.

The sandbox has no Elasticsearch, so a localhost ThreadingHTTPServer
speaks the exact wire protocol the reader depends on (the same
surface EsParquetWriter.java:62-98 exercises against a live
cluster): POST /{index}/_search?scroll=... with a slice body opens a
sliced cursor, POST /_search/scroll pages it, an empty hits page
ends it, DELETE /_search/scroll releases it. The PIT tests cover the
ES >= 7.10 replacement protocol (POST /{index}/_pit, /_search with
pit + search_after, DELETE /_pit), and the flaky-server test covers
the bounded-retry path. This verifies the reader's real HTTP path —
request shape, slice fan-out, continuation, termination, cleanup,
retry — not the JSON fixture shortcut.
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
    close_pit,
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
    """Minimal sliced-scroll + PIT ES: slice s serves docs with
    id % max == s, BATCH docs per page."""

    docs = _make_docs()
    cursors: dict = {}            # scroll_id -> (slice_id, offset)
    lock = threading.Lock()
    seen_paths: list = []
    counter = [0]
    cleared_scrolls: list = []    # DELETE /_search/scroll bodies
    opened_pits: list = []
    closed_pits: list = []
    flaky_503s = [0]              # serve this many 503s on scroll pages

    def _json(self, payload: dict):
        out = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n)) if n else {}

    def do_POST(self):              # noqa: N802  (stdlib naming)
        body = self._body()
        with self.lock:
            self.seen_paths.append(self.path)
        if re.match(r"^/.+/_pit\?keep_alive=", self.path):
            with self.lock:
                pid = f"pit-{len(self.opened_pits) + 1}"
                self.opened_pits.append(pid)
            self._json({"id": pid})
        elif re.match(r"^/.+/_search\?scroll=", self.path):
            sl = body["slice"]
            mine = [d for d in self.docs
                    if d["id"] % sl["max"] == sl["id"]]
            self._page(sl["id"], 0, mine)
        elif self.path.startswith("/_search/scroll"):
            with self.lock:
                if self.flaky_503s[0] > 0:
                    self.flaky_503s[0] -= 1
                    self.send_error(503)
                    return
                slice_id, offset = self.cursors[body["scroll_id"]]
            mine = [d for d in self.docs
                    if d["id"] % N_SLICES == slice_id]
            self._page(slice_id, offset, mine)
        elif self.path == "/_search" and "pit" in body:
            sl = body["slice"]
            after = body.get("search_after")
            mine = sorted((d for d in self.docs
                           if d["id"] % sl["max"] == sl["id"]),
                          key=lambda d: d["id"])
            if after is not None:
                mine = [d for d in mine if d["id"] > after[0]]
            page = mine[:body["size"]]
            self._json({
                "pit_id": body["pit"]["id"],
                "hits": {"hits": [{"_source": d, "sort": [d["id"]]}
                                  for d in page]},
            })
        else:
            self.send_error(404)

    def do_DELETE(self):            # noqa: N802
        body = self._body()
        with self.lock:
            self.seen_paths.append(f"DELETE {self.path}")
        if self.path.startswith("/_search/scroll"):
            with self.lock:
                self.cleared_scrolls.append(body.get("scroll_id"))
            self._json({"succeeded": True})
        elif self.path == "/_pit":
            with self.lock:
                self.closed_pits.append(body.get("id"))
            self._json({"succeeded": True})
        else:
            self.send_error(404)

    def _page(self, slice_id, offset, mine):
        page = mine[offset:offset + BATCH]
        with self.lock:
            self.counter[0] += 1
            sid = f"cursor-{self.counter[0]}"
            self.cursors[sid] = (slice_id, offset + BATCH)
        self._json({
            "_scroll_id": sid,
            "hits": {"hits": [{"_source": d} for d in page]},
        })

    def log_message(self, *a):       # keep pytest output clean
        pass


@pytest.fixture()
def fake_es():
    _FakeEs.seen_paths.clear()
    _FakeEs.cursors.clear()
    _FakeEs.cleared_scrolls.clear()
    _FakeEs.opened_pits.clear()
    _FakeEs.closed_pits.clear()
    _FakeEs.flaky_503s[0] = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeEs)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1]
    srv.shutdown()


SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("sev", T.LongType()),
])


def test_sliced_scroll_reads_every_doc_once(spark, fake_es):
    cfg = EsSourceConfig(host="127.0.0.1", port=fake_es,
                         index="security-events",
                         batch_size=BATCH, n_slices=N_SLICES)
    rows = read_elasticsearch(spark, cfg, SCHEMA).collect()

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
    # every slice cleared its scroll context when it finished
    assert len(_FakeEs.cleared_scrolls) == N_SLICES


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


def test_transient_5xx_is_retried(spark, fake_es):
    """Two 503s on scroll continuations must not lose a single doc:
    the executor-side reader backs off and retries the same page."""
    _FakeEs.flaky_503s[0] = 2
    cfg = EsSourceConfig(host="127.0.0.1", port=fake_es,
                         index="security-events",
                         batch_size=BATCH, n_slices=N_SLICES,
                         retry_backoff_s=0.05)
    rows = read_elasticsearch(spark, cfg, SCHEMA).collect()
    assert sorted(r["id"] for r in rows) == list(range(N_DOCS))
    assert _FakeEs.flaky_503s[0] == 0   # the 503s were actually served


def test_pit_search_after_reads_every_doc_once(spark, fake_es):
    """ES >= 7.10 path: one driver-side PIT shared by all slices,
    search_after keyset pagination, explicit close."""
    cfg = EsSourceConfig(host="127.0.0.1", port=fake_es,
                         index="security-events",
                         batch_size=BATCH, n_slices=N_SLICES,
                         use_pit=True)
    df = read_elasticsearch(spark, cfg, SCHEMA)
    rows = df.collect()
    assert sorted(r["id"] for r in rows) == list(range(N_DOCS))
    # exactly one PIT for the whole read (snapshot consistency), and
    # the slices paged /_search with it — never the scroll endpoint
    assert _FakeEs.opened_pits == ["pit-1"]
    assert not any(p.startswith("/_search/scroll")
                   for p in _FakeEs.seen_paths)
    close_pit(cfg, df._pit_id)
    assert _FakeEs.closed_pits == ["pit-1"]
