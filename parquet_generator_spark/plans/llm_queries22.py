"""LLM-pipeline twenty-second wave: REAL JPEG pixel decode.

jpeg_header_parse / exif_orientation_parse cover the metadata tier;
this closes the round-8 verdict's final "missing" item — pixel-level
stats over entropy-coded baseline JPEG payloads, PIL-free
(operators/jpeg_codec.py: numpy Huffman + dequantize + IDCT).

Oracle story (the part that makes a lossy codec hash-checkable):
each document plants a 16x16 grayscale image of four FLAT 8x8
blocks whose values are a closed-form function of doc_id, encoded
with ALL-ONES quant tables. A flat block has only a DC coefficient,
8*(v-128) is an integer, and Q=1 quantization is the identity — so
the decode is EXACT (pinned in tests/test_jpeg_codec.py) and DuckDB
can compute the decoded stats arithmetically while Spark runs the
full encode->Huffman->decode path per image inside mapInPandas
(Arrow batches; the multimodal pandas-UDF posture).

Scale shape: one narrow mapInPandas over the image rows — no
shuffle; per-image work is O(blocks). At 100 TB the same plan
decodes real web JPEGs (the codec reads any baseline 4:4:4 stream,
tables from the file's own DHT) with the stats emitted per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_N_BLOCKS = 4  # 2x2 blocks of 8x8 = 16x16 px


def _block_val(doc_id: str, b: int) -> str:
    """Closed-form planted block value, rendered for SQL."""
    return f"(({doc_id} * 37 + {b} * 71) % 236 + 10)"


def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image luma stats through the REAL baseline JPEG path:
    plant -> encode (Huffman, byte stuffing, JFIF framing) ->
    decode (DHT from the stream, IDCT) -> mean/min/max. Every
    decoded byte round-trips the entropy coder, so a bit error
    anywhere in the codec hash-mismatches the oracle."""
    import numpy as np
    import pandas as pd

    from parquet_generator_spark.operators.jpeg_codec import (
        QUANT_FLAT,
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    docs = (load_table(spark, "documents", sf_dir)
            .filter(F.col("doc_id") % 7 == 0)
            .select("doc_id"))

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("min_luma", T.IntegerType()),
        T.StructField("max_luma", T.IntegerType()),
    ])

    def run(batches):
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                vals = np.array(
                    [(did * 37 + b * 71) % 236 + 10
                     for b in range(_N_BLOCKS)]).reshape(2, 2)
                img = np.kron(vals, np.ones((8, 8))).astype(np.uint8)
                payload = encode_jpeg_baseline(img, QUANT_FLAT)
                dec = decode_jpeg_baseline(payload)
                out.append((did, float(dec.mean()),
                            int(dec.min()), int(dec.max())))
            yield pd.DataFrame(
                out, columns=[f.name for f in schema.fields])

    return docs.mapInPandas(run, schema=schema).orderBy("media_id")


_VALS = [_block_val("doc_id", b) for b in range(_N_BLOCKS)]
JPEG_DECODE_STATS_ORACLE = f"""
SELECT doc_id AS media_id,
       CAST({' + '.join(_VALS)} AS DOUBLE) / {_N_BLOCKS} AS mean_luma,
       CAST(least({', '.join(_VALS)}) AS INT) AS min_luma,
       CAST(greatest({', '.join(_VALS)}) AS INT) AS max_luma
FROM documents
WHERE doc_id % 7 = 0
ORDER BY media_id
"""

QUERIES.update({"jpeg_decode_stats": jpeg_decode_stats})
ORACLES.update({"jpeg_decode_stats": JPEG_DECODE_STATS_ORACLE})


# --------------------------------------------------- quality_model_score

# exported linear quality model (the shape a distilled fasttext-style
# doc-quality classifier has after export): literal weights over
# cheap codegen features, sigmoid score. Weights are plan literals.
_QM_BIAS = -1.1
_QM_W_LOGLEN = 0.55      # log(1+chars): longer docs score higher
_QM_W_STOP = 2.8         # stopword ratio: fluent prose marker
_QM_W_WLEN = -0.35       # very long avg tokens: code/garbage marker
_QM_W_DIGIT = -4.0       # digit density: boilerplate/table marker
_QM_STOPS = ("the", "a", "of", "to", "and", "in", "is", "that")


def _qm_z_spark() -> str:
    from parquet_generator_spark.operators.text import toks_spark

    toks = toks_spark("text")
    stops = ", ".join(f"'{s}'" for s in _QM_STOPS)
    return (
        f"{_QM_BIAS} "
        f"+ {_QM_W_LOGLEN} * ln(1 + length(text)) "
        f"+ {_QM_W_STOP} * (size(filter({toks}, t -> t IN ({stops}))) "
        f"  / cast(greatest(size({toks}), 1) AS DOUBLE)) "
        f"+ {_QM_W_WLEN} * (aggregate({toks}, cast(0 AS BIGINT), "
        f"  (a, t) -> a + length(t)) "
        f"  / cast(greatest(size({toks}), 1) AS DOUBLE)) "
        f"+ {_QM_W_DIGIT} * (length(regexp_replace(text, '[^0-9]', '')) "
        f"  / cast(greatest(length(text), 1) AS DOUBLE))")


def _qm_z_duck() -> str:
    from parquet_generator_spark.operators.text import toks_duck

    toks = toks_duck("text")
    stops = ", ".join(f"'{s}'" for s in _QM_STOPS)
    return (
        f"{_QM_BIAS} "
        f"+ {_QM_W_LOGLEN} * ln(1 + length(text)) "
        f"+ {_QM_W_STOP} * (len(list_filter({toks}, t -> t IN ({stops}))) "
        f"  / CAST(greatest(len({toks}), 1) AS DOUBLE)) "
        f"+ {_QM_W_WLEN} * (list_sum(list_transform({toks}, "
        f"  t -> length(t))) "
        f"  / CAST(greatest(len({toks}), 1) AS DOUBLE)) "
        f"+ {_QM_W_DIGIT} * (length(regexp_replace(text, '[^0-9]', '', "
        f"  'g')) / CAST(greatest(length(text), 1) AS DOUBLE))")


def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with the exported quality model (sigmoid
    over literal-weight codegen features — no UDF, no shuffle before
    the per-source aggregate) and report per source: doc count, mean
    quality, and the share passing the 0.5 keep-gate. This is the
    model-based filter stage of a curation pipeline (the
    heuristic-rule stages are gopher_quality / ccnet_quality_buckets;
    this is their trained-classifier sibling)."""
    docs = load_table(spark, "documents", sf_dir)
    z = _qm_z_spark()
    p = f"1.0 / (1.0 + exp(-({z})))"
    return (docs.filter(F.col("text").isNotNull())
            .select("source", F.expr(p).alias("p"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("p"), 4).alias("avg_quality"),
                 F.round(F.avg((F.col("p") >= 0.5).cast("double")), 4)
                 .alias("keep_share"))
            .orderBy("source"))


QUALITY_MODEL_SCORE_ORACLE = f"""
WITH scored AS (
  SELECT source, 1.0 / (1.0 + exp(-({_qm_z_duck()}))) AS p
  FROM documents WHERE text IS NOT NULL)
SELECT source, count(*) AS n_docs,
       round(avg(p), 4) AS avg_quality,
       round(avg(CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END), 4)
         AS keep_share
FROM scored
GROUP BY source
ORDER BY source
"""

QUERIES.update({"quality_model_score": quality_model_score})
ORACLES.update({"quality_model_score": QUALITY_MODEL_SCORE_ORACLE})
