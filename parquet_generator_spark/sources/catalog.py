"""Table catalog over the driver-generated parquet test data.

Loads are plain ``spark.read.parquet`` so Catalyst keeps full
pushdown/pruning ability; nothing is cached or collected here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str,
               sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.parquet stores ts as TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects; read nanos as long and
        # rebuild a micro-precision timestamp (matches DuckDB's
        # TIMESTAMP_NS down to the microsecond).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return spark.read.parquet(path)


def load_events_between(spark: SparkSession, sf_dir: str,
                        start_iso: str, end_iso: str) -> DataFrame:
    """events filtered to ``[start, end)`` with the time predicate
    pushed to the parquet scan.

    The generic loader rebuilds ``ts`` from the file's TIMESTAMP(NANOS)
    long AFTER the scan, so a filter on the rebuilt column can never
    prune row groups — at large scale that is a full-table read. Here
    the bounds are converted to nanos and applied to the RAW long
    column (plain comparison => PushedFilters + row-group statistics
    pruning), and the timestamp is rebuilt only for surviving rows.
    """
    from datetime import datetime, timezone

    def nanos(iso: str) -> int:
        dt = datetime.fromisoformat(iso).replace(tzinfo=timezone.utc)
        return int(dt.timestamp()) * 1_000_000_000

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (raw.filter((F.col("ts") >= nanos(start_iso))
                       & (F.col("ts") < nanos(end_iso)))
            .withColumn("ts", F.timestamp_micros(
                (F.col("ts") / 1000).cast("long"))))


def load_tables(spark: SparkSession,
                sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_temp_views(spark: SparkSession,
                        sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
