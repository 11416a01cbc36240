"""LLM-pipeline twenty-eighth tranche (round 12).

``dedup_index_appended`` — merge-on-append for the persisted MinHash
dedup index: the missing half of the index lifecycle the IVF-PQ
artifact already had (train once / ``append_ivfpq_batch`` /
serve). Train the index on the base corpus slice, APPEND a second
ingest slice with ``append_dedup_batch`` (one signature pass over
the new slice only; bucket stats MERGED, never recounted), then
classify the query batch against the grown artifact. Value-identical
to retraining on base+append in one shot (pinned in
tests/test_dedup_index.py::test_append_equals_rebuild), so the
oracle is the same from-scratch incremental_dedup SQL the served
index uses. Daily-ingest reality at 100 TB: each cycle pays
O(new batch) compute, the corpus side is never re-signed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


def dedup_index_appended(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Train on doc_id%4==0, append doc_id%4==2, classify the odd
    batch — corpus == evens, exactly dedup_index_served's split, so
    the from-scratch oracle is shared."""
    from parquet_generator_spark.operators import dedup_index
    from parquet_generator_spark.plans.llm_queries8 import INC_TAU
    from parquet_generator_spark.plans.llm_queries25 import (
        _REPO_ROOT,
    )

    root = os.path.join(
        _REPO_ROOT, ".scratch", "dedup_index_app",
        os.path.basename(os.path.normpath(sf_dir)))
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    fp = f"{st.st_mtime_ns}:{st.st_size}:appended"
    meta = dedup_index.read_index_meta(root)
    docs = load_table(spark, "documents", sf_dir)
    if meta is None or meta.get("fingerprint") != fp:
        dedup_index.drop_index(root)
        base = docs.filter(F.col("doc_id") % 4 == 0)
        dedup_index.train_dedup_index(
            spark, base, root, id_col="doc_id",
            content_col="text", fingerprint=fp + ":partial")
        ingest = docs.filter(F.col("doc_id") % 4 == 2)
        dedup_index.append_dedup_batch(
            spark, root, ingest, id_col="doc_id",
            content_col="text", fingerprint=fp)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    out = dedup_index.classify_served(
        spark, root, batch, INC_TAU, id_col="doc_id",
        content_col="text")
    return (out.select(F.col("id").alias("doc_id"), "status")
            .orderBy("doc_id"))


def _dedup_index_appended_oracle() -> str:
    from parquet_generator_spark.plans.llm_queries8 import (
        INCREMENTAL_DEDUP_ORACLE,
    )

    return INCREMENTAL_DEDUP_ORACLE


QUERIES.update({"dedup_index_appended": dedup_index_appended})
ORACLES.update({"dedup_index_appended": _dedup_index_appended_oracle()})
