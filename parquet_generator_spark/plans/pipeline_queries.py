"""Pipeline-utility queries: anti join, deterministic train/val/test
splitting, pivot reshape, and multimodal frame-sampling — the
remaining verbs a training-data pipeline leans on daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.operators.multimodal import (
    frame_sample,
    synthesize_media,
)
from parquet_generator_spark.sources.catalog import load_table


def anti_join_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO orders in 1997 (left-anti join — the
    complement of q4's semi join), counted per market segment."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    o97 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    return (cust.join(o97, F.col("c_custkey") == F.col("o_custkey"),
                      "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_inactive"))
            .orderBy("c_mktsegment"))


ANTI_JOIN_ORACLE = """
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# deterministic hash split: md5 of the id -> bucket 0..99.
# Engine-portable (md5 is bit-identical everywhere, unlike each
# engine's private hash()), stable under repartitioning/reruns —
# the property a training/holdout split MUST have.
SPLIT_BUCKETS = (80, 90)  # <80 train, <90 val, else test


def _bucket_spark(id_col: str) -> F.Column:
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
               16, 10).cast("bigint"),
        F.lit(100))


def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment for every
    document by content-independent id hash; per-source split sizes.
    A narrow map + one count shuffle — no sampling RNG, so the split
    is reproducible across runs, engines, and cluster layouts."""
    docs = load_table(spark, "documents", sf_dir)
    b = _bucket_spark("doc_id")
    split = (F.when(b < SPLIT_BUCKETS[0], "train")
             .when(b < SPLIT_BUCKETS[1], "val")
             .otherwise("test"))
    return (docs.withColumn("split", split)
            .groupBy("source", "split")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("source", "split"))


TRAIN_TEST_SPLIT_ORACLE = f"""
SELECT source,
       CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < {SPLIT_BUCKETS[0]} THEN 'train'
            WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < {SPLIT_BUCKETS[1]} THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n
FROM documents GROUP BY source, split ORDER BY source, split
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshape: daily value totals pivoted to one column per event
    type (explicit category list keeps the schema static — an
    unpinned pivot would need an extra distinct pass and make the
    output schema data-dependent)."""
    ev = load_table(spark, "events", sf_dir)
    return (ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
            .pivot("event_type", list(EVENT_TYPES))
            .agg(F.round(F.sum("value"), 2))
            .orderBy("day"))


PIVOT_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       round(sum(value) FILTER (WHERE event_type = 'click'), 2)    AS click,
       round(sum(value) FILTER (WHERE event_type = 'error'), 2)    AS error,
       round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase,
       round(sum(value) FILTER (WHERE event_type = 'signup'), 2)   AS signup,
       round(sum(value) FILTER (WHERE event_type = 'view'), 2)     AS view
FROM events GROUP BY day ORDER BY day
"""


FRAME_EVERY_MS = 500


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp
    (JVM sequence explode over duration metadata; pixel decode is the
    stubbed stage), rolled up to corpus totals."""
    docs = load_table(spark, "documents", sf_dir)
    frames = frame_sample(synthesize_media(docs), FRAME_EVERY_MS)
    return (frames.groupBy("media_id")
            .agg(F.count(F.lit(1)).alias("n_frames"))
            .agg(F.count(F.lit(1)).alias("n_videos"),
                 F.sum("n_frames").alias("total_frames"),
                 F.round(F.avg("n_frames"), 4).alias("avg_frames")))


MULTIMODAL_FRAMES_ORACLE = f"""
WITH v AS (
  SELECT doc_id, n_chars * 10 AS duration_ms,
         CAST(floor(greatest(n_chars * 10 - 1, 0) / {FRAME_EVERY_MS}) AS BIGINT)
           + 1 AS n_frames
  FROM documents WHERE doc_id % 3 = 2)
SELECT count(*) AS n_videos,
       CAST(sum(n_frames) AS BIGINT) AS total_frames,
       round(avg(n_frames), 4) AS avg_frames
FROM v
"""


def media_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary parsing, no libraries: build valid PNG headers
    (8-byte signature + IHDR chunk, dimensions derived from n_chars)
    as a binary column, then parse width/height back OUT of the raw
    bytes with substring+hex+conv — all JVM-side codegen, the exact
    shape a metadata-extraction pass over 100 TB of real image
    payloads takes (narrow map over the binary column, no shuffle).
    The oracle recomputes the dimensions arithmetically, so a parser
    bug (offset, endianness) hash-mismatches."""
    docs = load_table(spark, "documents", sf_dir)
    w = (F.col("n_chars") % 1024 + 16).cast("int")
    h = (F.col("n_chars") % 768 + 16).cast("int")

    def be4(c):  # 4-byte big-endian binary from an int column
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    payload = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A")),   # PNG signature
        F.unhex(F.lit("0000000D")),           # IHDR length = 13
        F.unhex(F.lit("49484452")),           # "IHDR"
        be4(w), be4(h),
        F.unhex(F.lit("0806000000")))         # bit depth/color/etc
    media = docs.select(F.col("doc_id").alias("media_id"),
                        payload.alias("payload"))
    parsed_w = F.conv(F.hex(F.expr("substring(payload, 17, 4)")),
                      16, 10).cast("int")
    parsed_h = F.conv(F.hex(F.expr("substring(payload, 21, 4)")),
                      16, 10).cast("int")
    return (media.select("media_id",
                         parsed_w.alias("width"),
                         parsed_h.alias("height"),
                         F.length("payload").alias("n_bytes"))
            .orderBy("media_id"))


MEDIA_HEADER_ORACLE = """
SELECT doc_id AS media_id,
       CAST(n_chars % 1024 + 16 AS INT) AS width,
       CAST(n_chars % 768 + 16 AS INT) AS height,
       29 AS n_bytes
FROM documents ORDER BY media_id
"""


def audio_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV/RIFF sibling of media_header_parse — and the interesting
    half of real media metadata extraction: RIFF fields are
    LITTLE-endian, so the parser reassembles each integer from
    per-byte substring+hex+conv with positional weights (a naive
    big-endian read of the same bytes hash-mismatches the oracle
    immediately). Builds a valid 44-byte canonical WAV header per
    doc, then parses sample rate / channels / data size back out and
    derives the clip duration — all JVM codegen, narrow map, no
    shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    rate = (F.lit(8000) + F.col("n_chars") % 40000).cast("long")
    chans = (F.lit(1) + F.col("doc_id") % 2).cast("long")
    data_size = (F.col("n_chars") * 100).cast("long")
    byte_rate = rate * chans * 2
    block_align = chans * 2

    def le(c, nbytes):  # int column -> n-byte little-endian binary
        parts = [F.unhex(F.lpad(F.hex(F.shiftright(c, 8 * i) % 256),
                                2, "0"))
                 for i in range(nbytes)]
        return F.concat(*parts)

    payload = F.concat(
        F.unhex(F.lit("52494646")),            # "RIFF"
        le(data_size + 36, 4),                 # riff chunk size
        F.unhex(F.lit("57415645")),            # "WAVE"
        F.unhex(F.lit("666D7420")),            # "fmt "
        le(F.lit(16).cast("long"), 4),         # fmt chunk size
        le(F.lit(1).cast("long"), 2),          # PCM
        le(chans, 2), le(rate, 4),
        le(byte_rate, 4), le(block_align, 2),
        le(F.lit(16).cast("long"), 2),         # bits/sample
        F.unhex(F.lit("64617461")),            # "data"
        le(data_size, 4))
    media = docs.select(F.col("doc_id").alias("media_id"),
                        payload.alias("payload"))

    def parse_le(pos, nbytes):  # little-endian int from payload bytes
        terms = [
            F.conv(F.hex(F.expr(f"substring(payload, {pos + i}, 1)")),
                   16, 10).cast("long") * (256 ** i)
            for i in range(nbytes)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    p_rate = parse_le(25, 4)
    p_chans = parse_le(23, 2)
    p_data = parse_le(41, 4)
    p_brate = parse_le(29, 4)
    return (media.select(
                "media_id",
                p_rate.alias("sample_rate"),
                p_chans.alias("channels"),
                p_data.alias("data_bytes"),
                F.round(p_data.cast("double") * 1000.0 / p_brate, 2)
                .alias("duration_ms"),
                F.length("payload").alias("n_bytes"))
            .orderBy("media_id"))


AUDIO_HEADER_ORACLE = """
SELECT doc_id AS media_id,
       CAST(8000 + n_chars % 40000 AS BIGINT) AS sample_rate,
       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
       CAST(n_chars * 100 AS BIGINT) AS data_bytes,
       round(CAST(n_chars * 100 AS DOUBLE) * 1000.0 /
             ((8000 + n_chars % 40000) * (1 + doc_id % 2) * 2), 2)
         AS duration_ms,
       44 AS n_bytes
FROM documents ORDER BY media_id
"""


QUERIES = {
    "media_header_parse": media_header_parse,
    "audio_header_parse": audio_header_parse,
    "anti_join_inactive": anti_join_inactive,
    "train_test_split": train_test_split,
    "pivot_daily_revenue": pivot_daily_revenue,
    "multimodal_frames": multimodal_frames,
}

ORACLES = {
    "media_header_parse": MEDIA_HEADER_ORACLE,
    "audio_header_parse": AUDIO_HEADER_ORACLE,
    "anti_join_inactive": ANTI_JOIN_ORACLE,
    "train_test_split": TRAIN_TEST_SPLIT_ORACLE,
    "pivot_daily_revenue": PIVOT_ORACLE,
    "multimodal_frames": MULTIMODAL_FRAMES_ORACLE,
}
