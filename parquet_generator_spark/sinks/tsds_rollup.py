"""TSDS downsample-on-write: the ES 8.5+ downsampled-index
lifecycle (VERDICT r12 mandate #4) — the dedup-index snapshot
lifecycle applied to metrics.

ES downsampling REPLACES a raw time-series index with one document
per (dimension tuple, bucket) carrying last/min/max/sum/count.
``dsl_tsds_downsample`` computes that rollup per QUERY; this sink
materializes it ONCE through the snapshot table format
(sinks/snapshots.py: versioned manifests, time travel) and keeps it
current with MERGE-ON-APPEND — a new slice of events pays one
grouped pass over the slice plus a merge against the existing
rollup (series x buckets rows, tiny next to raw), never a re-scan
of the historical corpus.

Merge correctness details:
- ``sum`` is carried UNROUNDED internally (_sum_raw) and rounded at
  serve time — merging rounded partial sums would drift from the
  per-query rollup; min/max commute with rounding (monotone), so
  they merge directly;
- the last-value pick carries its (ts, event_id) witness columns so
  a merge can re-adjudicate "latest" across old and new slices with
  the same tie-break the per-query window uses;
- append == rebuild is pinned in tests/test_tsds_rollup.py, and the
  driver key ``dsl_tsds_downsample_served`` reuses the per-query
  key's DuckDB oracle VERBATIM, so the driver itself proves the
  materialized rollup value-identical to the on-the-fly one.

At 100 TB this is the TSDS write path: the rollup shuffles on
(series, bucket) — the _tsid routing key the index already uses —
once per ingested slice, and every downsample-granularity query
afterwards scans series x buckets rows instead of raw events.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquet_generator_spark.sinks import snapshots

BUCKET_SECONDS = 21600  # the 6h ES downsample granularity

_PUBLIC = ("event_type", "bucket", "n", "min_value", "max_value",
           "sum_value", "last_value")


def _meta_path(root: str) -> str:
    return os.path.join(root, "rollup_meta.json")


def read_rollup_meta(root: str) -> dict | None:
    p = _meta_path(root)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _slice_rollup(events: DataFrame) -> DataFrame:
    """The internal per-slice rollup: one row per (series, bucket)
    with mergeable stats + the last-value witness."""
    b = events.select(
        "event_type", "value", "ts", "event_id",
        F.date_format(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / BUCKET_SECONDS)
                .cast("long") * BUCKET_SECONDS),
            "yyyy-MM-dd HH:mm:ss").alias("bucket"))
    w = (Window.partitionBy("event_type", "bucket")
         .orderBy(F.desc("ts"), F.desc("event_id")))
    last = (b.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("event_type", "bucket",
                    F.col("ts").alias("_last_ts"),
                    F.col("event_id").alias("_last_id"),
                    F.col("value").alias("_last_raw")))
    stats = (b.groupBy("event_type", "bucket")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.min("value").alias("_min_raw"),
                  F.max("value").alias("_max_raw"),
                  F.sum("value").alias("_sum_raw")))
    return stats.join(last, ["event_type", "bucket"])


def _merge(old: DataFrame, new: DataFrame) -> DataFrame:
    """Merge two internal rollups: counts/sums add, min/max fold,
    the later (ts, id) witness wins the last value."""
    u = old.unionByName(new)
    return (u.groupBy("event_type", "bucket")
            .agg(F.sum("n").alias("n"),
                 F.min("_min_raw").alias("_min_raw"),
                 F.max("_max_raw").alias("_max_raw"),
                 F.sum("_sum_raw").alias("_sum_raw"),
                 F.max(F.struct("_last_ts", "_last_id",
                                "_last_raw")).alias("_w"))
            .select("event_type", "bucket", "n", "_min_raw",
                    "_max_raw", "_sum_raw",
                    F.col("_w._last_ts").alias("_last_ts"),
                    F.col("_w._last_id").alias("_last_id"),
                    F.col("_w._last_raw").alias("_last_raw")))


def _table(root: str) -> str:
    return os.path.join(root, "rollup_6h")


def train_rollup(spark: SparkSession, events: DataFrame,
                 root: str) -> int:
    """Initial downsample-on-write: roll the full slice up and
    commit it as the snapshot table's first (or a fresh overwrite)
    version."""
    os.makedirs(root, exist_ok=True)
    df = _slice_rollup(events)
    path = _table(root)
    try:
        snapshots.current_version(path)
    except FileNotFoundError:
        v = snapshots.create_table(spark, path, df)
    else:
        v = snapshots.commit_overwrite(spark, path, df)
    with open(_meta_path(root), "w") as fh:
        json.dump({"version": v, "bucket_seconds": BUCKET_SECONDS},
                  fh)
    return v


def append_rollup(spark: SparkSession, root: str,
                  new_events: DataFrame) -> int:
    """Merge-on-append: one grouped pass over the NEW slice, one
    merge against the current rollup (series x buckets rows), one
    overwrite commit. The historical corpus is never re-scanned."""
    path = _table(root)
    old = snapshots.read_snapshot(spark, path)
    merged = _merge(old, _slice_rollup(new_events))
    v = snapshots.commit_overwrite(spark, path, merged)
    with open(_meta_path(root), "w") as fh:
        json.dump({"version": v, "bucket_seconds": BUCKET_SECONDS},
                  fh)
    return v


def serve_rollup(spark: SparkSession, root: str,
                 version: int | None = None) -> DataFrame:
    """The public downsampled view (the dsl_tsds_downsample output
    schema), read from the snapshot — no raw-events scan."""
    df = snapshots.read_snapshot(spark, _table(root), version)
    return df.select(
        "event_type", "bucket", "n",
        F.round("_min_raw", 4).alias("min_value"),
        F.round("_max_raw", 4).alias("max_value"),
        F.round("_sum_raw", 4).alias("sum_value"),
        F.round("_last_raw", 4).alias("last_value"))
