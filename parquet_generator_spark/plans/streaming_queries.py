"""Streaming-surface queries (batch-equivalent forms for the
correctness gate; the streaming execution itself is covered by
tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_generator_spark.sources.catalog import load_table
from parquet_generator_spark.streaming.windowed import (
    WINDOWED_ORACLE,
    windowed_event_counts,
)


def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch run of the exact plan the streaming job uses (tumbling
    epoch-aligned windows), so the oracle can verify the window
    arithmetic the stream relies on."""
    ev = load_table(spark, "events", sf_dir)
    return (windowed_event_counts(ev)
            .orderBy("win_start", "event_type"))


QUERIES = {"stream_windowed_agg": stream_windowed_agg}
ORACLES = {"stream_windowed_agg": WINDOWED_ORACLE}
