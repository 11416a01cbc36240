"""Table catalog over the driver-generated parquet test data.

Loads are plain ``spark.read.parquet`` so Catalyst keeps full
pushdown/pruning ability; nothing is cached or collected here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read events.parquet whatever its physical ``ts`` encoding.

    The generated data has shipped two encodings over time:
    TIMESTAMP(NANOS) (which the vectorized reader only accepts as a
    raw long via ``spark.sql.legacy.parquet.nanosAsLong``) and plain
    ``timestamp[us]``.  Read optimistically; fall back to the legacy
    nanos-as-long mode ONLY for the TIMESTAMP(NANOS) schema-inference
    AnalysisException — any other failure (missing file, corrupt
    footer) propagates untouched instead of hiding behind a retry.
    The conf deliberately STAYS set after a fallback: the parquet
    reader consults it again at job execution, so reverting it after
    analysis would fail the very scan the fallback enabled; and once
    one legacy file exists in the session's data, reading its
    siblings the same way is what the caller wants.
    The caller normalizes whatever dtype comes back.
    """
    try:
        return spark.read.parquet(path)
    except Exception as e:
        if not ("TIMESTAMP(NANOS" in str(e) or "nanosAsLong" in str(e)):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Make ``ts`` a session-tz TIMESTAMP regardless of storage dtype."""
    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        # legacy nanos-long: rebuild a micro-precision timestamp
        # (matches DuckDB's TIMESTAMP_NS down to the microsecond)
        return df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    if isinstance(t, TimestampNTZType):
        # timestamp[us] with isAdjustedToUTC=false infers as NTZ;
        # with the session tz pinned to UTC the cast is value-exact
        # and keeps downstream TimestampType expressions working.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str,
               sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _normalize_ts(_read_events(spark, path))
    return spark.read.parquet(path)


def load_events_between(spark: SparkSession, sf_dir: str,
                        start_iso: str, end_iso: str) -> DataFrame:
    """events filtered to ``[start, end)`` with the time predicate
    pushed to the parquet scan.

    The filter must hit the RAW scan column — a predicate on a
    rebuilt/cast column never reaches PushedFilters, and at large
    scale that is a full-table read instead of row-group pruning.
    For native timestamp files a literal cast to the scan dtype keeps
    the column side untouched (=> pushdown + stats pruning); only
    legacy TIMESTAMP(NANOS) longs need the epoch-nanos arithmetic.
    """
    from datetime import datetime, timezone

    def nanos(iso: str) -> int:
        dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    raw = _read_events(spark, os.path.join(sf_dir, "events.parquet"))
    t = raw.schema["ts"].dataType
    if isinstance(t, LongType):
        return (raw.filter((F.col("ts") >= nanos(start_iso))
                           & (F.col("ts") < nanos(end_iso)))
                .withColumn("ts", F.timestamp_micros(
                    (F.col("ts") / 1000).cast("long"))))
    lo, hi = F.lit(start_iso).cast(t), F.lit(end_iso).cast(t)
    return _normalize_ts(
        raw.filter((F.col("ts") >= lo) & (F.col("ts") < hi)))


def load_tables(spark: SparkSession,
                sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_temp_views(spark: SparkSession,
                        sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
