"""Bucketed-table sink: pre-shuffle data ON WRITE so repeated joins
and aggregations on the bucket key never exchange again.

At 100 TB the same fact-fact join (lineitem ⨝ orders on orderkey)
re-shuffles both sides on every query; writing both tables bucketed
by the key moves that shuffle into the (one-time) write. Spark then
plans the join as zipped bucket scans — `test_bucketed_join_no_
exchange` asserts the Exchange really disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int, path: str | None = None) -> None:
    """Write ``df`` as a bucketed+sorted parquet table. ``path`` makes
    it external (useful under test tmp dirs); bucket metadata lives in
    the session catalog either way."""
    writer = (df.write.format("parquet").mode("overwrite")
              .bucketBy(n_buckets, key).sortBy(key))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: per-bucket
    zipped scans, no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key)
