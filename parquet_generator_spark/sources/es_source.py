"""Elasticsearch source: slice-parallel scroll reads into a DataFrame.

Reference parity: EsParquetWriter.java:62-98 scroll-reads one index
per thread (5-10 driver-side threads, 10k docs per batch) and funnels
every document through a single-process writer. Spark-first redesign:
ES's *sliced scroll* API shards a scroll server-side into N disjoint
slices; we map each slice to one Spark partition via ``mapInPandas``,
so a 1000-executor cluster holds 1000 concurrent scroll cursors and
the driver never touches a document. Decoding is the lenient
``from_json`` path (missing field -> null), the Spark-native
equivalent of decode/ExtendedJsonDecoder.java.

Network I/O uses only stdlib urllib (no extra deps); the test
environment has no ES, so tests exercise ``read_json_fixture`` —
the identical plan with a file-backed hit source.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_generator_spark.schema.infer import lenient_decode, promote_nullable


@dataclass
class EsSourceConfig:
    host: str
    port: int = 9200
    index: str = "*"
    doc_type: str | None = None          # pre-7.x _type, like the reference
    query: dict = field(default_factory=lambda: {"match_all": {}})
    batch_size: int = 10_000             # reference uses size=10000
    n_slices: int = 32                   # parallel scroll cursors
    scroll_ttl: str = "3m"               # reference uses 3m
    scheme: str = "http"


def _scroll_slice(cfg: EsSourceConfig, slice_id: int):
    """Generator of _source JSON strings for one scroll slice.
    Runs inside an executor task."""
    import urllib.request

    base = f"{cfg.scheme}://{cfg.host}:{cfg.port}"
    path = f"/{cfg.index}"
    if cfg.doc_type:
        path += f"/{cfg.doc_type}"
    body = {
        "query": cfg.query,
        "size": cfg.batch_size,
        "slice": {"id": slice_id, "max": cfg.n_slices},
    }

    def post(url: str, payload: dict) -> dict:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as resp:
            return json.loads(resp.read())

    resp = post(f"{base}{path}/_search?scroll={cfg.scroll_ttl}", body)
    while True:
        hits = resp.get("hits", {}).get("hits", [])
        if not hits:
            break
        for h in hits:
            yield json.dumps(h["_source"])
        resp = post(f"{base}/_search/scroll",
                    {"scroll": cfg.scroll_ttl,
                     "scroll_id": resp["_scroll_id"]})


def read_elasticsearch(spark: SparkSession, cfg: EsSourceConfig,
                       schema: T.StructType) -> DataFrame:
    """Distributed sliced-scroll read -> DataFrame with ``schema``.

    One Spark partition per slice; each partition pulls its slice
    independently and decodes leniently against ``schema``.
    """
    schema = promote_nullable(schema)
    slices = spark.range(cfg.n_slices).repartition(cfg.n_slices, "id")

    def pull(batches):
        import pandas as pd
        for pdf in batches:
            for slice_id in pdf["id"]:
                docs = list(_scroll_slice(cfg, int(slice_id)))
                if docs:
                    yield pd.DataFrame({"doc": docs})

    raw = slices.mapInPandas(
        pull, schema=T.StructType([T.StructField("doc", T.StringType())]))
    return decode_docs(raw, "doc", schema)


def decode_docs(df: DataFrame, column: str,
                schema: T.StructType) -> DataFrame:
    """Lenient JSON decode of a document column to top-level fields."""
    return (df.withColumn("_rec", lenient_decode(F.col(column), schema))
              .select("_rec.*"))


def read_json_fixture(spark: SparkSession, path: str,
                      schema: T.StructType) -> DataFrame:
    """File-backed stand-in for an ES index (one JSON doc per line):
    same decode path as read_elasticsearch, minus the network."""
    raw = spark.read.text(path).withColumnRenamed("value", "doc")
    return decode_docs(raw, "doc", promote_nullable(schema))
