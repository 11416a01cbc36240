"""Structured-Streaming ingest: the reference's continuous ES pull
(EsParquetWriter's scroll loop) re-expressed as readStream ->
writeStream.

A directory of JSON documents plays the role of the ES index (each
new file = one scroll batch); the stream decodes leniently against a
fixed schema, filters to the rule, and appends date-partitioned
parquet with exactly-once checkpointing — which is strictly stronger
than the reference's restart-from-scratch semantics
(EsParquetWriter.java:52-56 deletes and rewrites the file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_generator_spark.operators.esdsl import match_phrase
from parquet_generator_spark.schema.infer import promote_nullable


def stream_json_ingest(
    spark: SparkSession,
    in_dir: str,
    schema: T.StructType,
    rule_name: str | None = None,
    rule_field: str = "rule_name",
) -> DataFrame:
    """readStream over a JSON-docs directory with lenient decode and
    optional rule filter. Returns the streaming DataFrame."""
    stream = (spark.readStream
              .schema(promote_nullable(schema))
              .option("maxFilesPerTrigger", 8)
              .json(in_dir))
    if rule_name is not None:
        stream = stream.filter(match_phrase(rule_field, rule_name))
    return stream


def write_parquet_stream(stream: DataFrame, out_dir: str,
                         checkpoint_dir: str,
                         partition_col: str | None = None):
    """Append-mode parquet sink with checkpointing; availableNow
    trigger so tests (and batch backfills) drain the source and
    stop."""
    writer = (stream.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append")
              .trigger(availableNow=True))
    if partition_col:
        writer = writer.partitionBy(partition_col)
    return writer.start()
