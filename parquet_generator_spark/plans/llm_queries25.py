"""LLM-pipeline twenty-fifth tranche: ANN serving from the
PERSISTED IVF-PQ index (operators/ann_index.py).

``ann_ivfpq_served`` answers the same query as ``ann_ivfpq`` but
from the committed snapshot artifact: the index is trained ONCE per
corpus (train-if-stale on the embeddings file fingerprint, the
materialized-view contract), and the serving plan reads ONLY the
stored (cell, codes) table — no centroid derivation, no raw
vectors, no mapInPandas (plan-asserted in tests/test_ann_index.py).
At 100 TB this is the difference between a training pass per query
and a bounded-literal lookup plan over code files pruned by cell.

The oracle is the full from-corpus IVF-PQ rebuild (shared with
ann_ivfpq): the served result is provably value-identical because
training uses the same reproducible quantizer construction and the
serving ADC sum preserves the kernel's sequential add order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from parquet_generator_spark.operators import ann_index
from parquet_generator_spark.plans.llm_queries24 import (
    IVFPQ_CELLS,
    IVFPQ_PROBE,
    IVFPQ_QUERY,
    IVFPQ_TOPK,
    _ivfpq_oracle,
)
from parquet_generator_spark.plans.llm_queries15 import PQ_K, PQ_M
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))


def index_root(sf_dir: str) -> str:
    return os.path.join(_REPO_ROOT, ".scratch", "ivfpq_index",
                        os.path.basename(os.path.normpath(sf_dir)))


def corpus_fingerprint(sf_dir: str) -> str:
    p = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(p)
    return f"{st.st_mtime_ns}:{st.st_size}"


def ensure_index(spark: SparkSession, sf_dir: str) -> str:
    """Train-if-stale: rebuild only when the corpus file fingerprint
    changed (the materialized-view refresh contract). Returns the
    index root."""
    root = index_root(sf_dir)
    fp = corpus_fingerprint(sf_dir)
    meta = ann_index.read_index_meta(root)
    if meta is None or meta.get("fingerprint") != fp:
        ann_index.drop_index(root)
        emb = load_table(spark, "embeddings", sf_dir)
        ann_index.train_ivfpq_index(
            spark, emb, root, n_cells=IVFPQ_CELLS, n_sub=PQ_M,
            n_codes=PQ_K, fingerprint=fp)
    return root


def ann_ivfpq_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by IVF-probe + PQ-ADC served from the persisted index:
    (rank, vec_id, adc), value-identical to ann_ivfpq. The serving
    DAG touches only the codes snapshot (filter on cell pushed to
    its parquet scan) plus ~8 KB of ADC literals."""
    root = ensure_index(spark, sf_dir)
    return ann_index.serve_ivfpq(spark, root, IVFPQ_QUERY,
                                 IVFPQ_TOPK, n_probe=IVFPQ_PROBE)


QUERIES.update({"ann_ivfpq_served": ann_ivfpq_served})
# the from-corpus rebuild IS the served result's ground truth: the
# artifact adds persistence, not different math
ORACLES.update({"ann_ivfpq_served": _ivfpq_oracle()})
