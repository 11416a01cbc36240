"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a too-narrow input so compute-bound
    narrow transformations (shingling, hashing, signatures) use every
    core.

    A small file arrives as ONE scan split, which would serialize the
    whole pipeline behind a single task; at real scale the scan
    already has >= cluster-parallelism splits and this is a no-op —
    so the shuffle this inserts only ever moves tiny inputs.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
