"""Shard-export sink: fixed-size shards, manifest integrity, pruned
single-shard reads, and the distributed-zipWithIndex rank itself."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from parquet_generator_spark.sinks.shard_export import (
    export_shards,
    read_manifest,
    read_shard,
    with_global_rank,
)
from parquet_generator_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_global_rank_is_dense_and_ordered(spark):
    docs = load_table(spark, "documents", SF)
    ranked = with_global_rank(docs, "doc_id", n_parts=7).collect()
    by_rank = sorted(ranked, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(len(by_rank)))
    ids = [r["doc_id"] for r in by_rank]
    assert ids == sorted(ids)          # rank follows id order exactly


def test_export_shards_manifest_ties_out(spark, tmp_path):
    docs = load_table(spark, "documents", SF)
    n = docs.count()
    dest = str(tmp_path / "shards")
    export_shards(docs, dest, docs_per_shard=64)

    man = {r["shard"]: r for r in read_manifest(spark, dest).collect()}
    # contiguous shards, all full except possibly the last
    assert sorted(man) == list(range(len(man)))
    sizes = [man[s]["n_docs"] for s in sorted(man)]
    assert all(x == 64 for x in sizes[:-1])
    assert 0 < sizes[-1] <= 64
    assert sum(sizes) == n
    # id ranges are disjoint and ordered (shard = rank-by-id blocks)
    for s in range(len(man) - 1):
        assert man[s]["max_id"] < man[s + 1]["min_id"]

    # data matches the manifest shard-by-shard
    got = read_shard(spark, dest, 0)
    rows = got.collect()
    assert len(rows) == man[0]["n_docs"]
    assert (min(r["doc_id"] for r in rows) == man[0]["min_id"]
            and max(r["doc_id"] for r in rows) == man[0]["max_id"])
    # token totals in the manifest equal recomputing from the data
    recount = (spark.read.parquet(f"{dest}/data")
               .groupBy("shard").agg(F.sum("n_tokens").alias("t")))
    for r in recount.collect():
        assert r["t"] == man[r["shard"]]["n_tokens"]


def test_read_shard_prunes_partitions(spark, tmp_path):
    docs = load_table(spark, "documents", SF)
    dest = str(tmp_path / "shards")
    export_shards(docs, dest, docs_per_shard=100)
    df = read_shard(spark, dest, 2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the shard predicate must prune directories at planning time,
    # not surface as a data filter over the full corpus
    assert "PartitionFilters" in plan and "shard" in plan
