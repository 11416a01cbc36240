"""Thin adapter mapping the bus contract (sources/bus_source.py)
onto Spark's Kafka source, so a user with a real cluster points the
SAME interface at ``spark.readStream.format("kafka")`` and keeps the
offset ledger, replay, and exactly-once sink semantics the contract
tests pin.

What the adapter owns (all testable without a broker):
- option building: the exact option dict Spark's Kafka connector
  expects — ``kafka.bootstrap.servers``, ``subscribe``,
  ``startingOffsets`` as the connector's per-topic-partition JSON
  (rendered FROM the contract's committed-offset ledger, so a
  restart resumes exactly where the directory-broker consumer or a
  previous Kafka run left off), ``maxOffsetsPerTrigger`` (an
  APPROXIMATE rendering of the contract's max_records_per_partition
  bound: the connector distributes one per-trigger budget across
  partitions in proportion to their lag, so under skewed lag a
  single hot partition can receive more than the contract's
  per-partition bound within one trigger — the total per trigger is
  still capped at bound × partition count, but the per-partition
  guarantee the directory broker enforces exactly is only
  approximate here), and
  ``failOnDataLoss`` pinned false for retention-expired replays;
- frame normalization: Kafka's wire schema (binary key/value,
  topic/partition/offset/timestamp) -> the contract's
  RECORD_SCHEMA, so every downstream plan written against the
  canned broker runs unchanged;
- the streaming entry itself: one ``readStream.format("kafka")``
  call with those options. The connector jar is not in this
  sandbox, so the call is surfaced behind a clear error message;
  everything up to it is exercised by tests/test_bus_contract.py
  against the canned broker.

Offsets note: Kafka's startingOffsets JSON uses -1/-2 sentinels for
latest/earliest; the ledger stores only real offsets, and absent
partitions default to -2 (earliest) — the contract's "start from 0"
for a new partition, expressed the connector's way.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.bus_source import (
    RECORD_SCHEMA,
    read_committed,
)

EARLIEST = -2  # Kafka connector sentinel for "earliest"


def starting_offsets_json(topic: str, committed: dict[int, int],
                          partitions: list[int]) -> str:
    """Render the committed ledger as the connector's
    ``startingOffsets`` JSON. Partitions with no committed offset
    start at earliest (-2) — the contract's start-from-0 for a new
    partition."""
    per_part = {str(p): committed.get(p, EARLIEST)
                for p in sorted(partitions)}
    return json.dumps({topic: per_part}, sort_keys=True)


def kafka_options(bootstrap_servers: str, topic: str,
                  committed: dict[int, int],
                  partitions: list[int],
                  max_records_per_partition: int | None = None
                  ) -> dict[str, str]:
    """The full option dict for ``readStream.format("kafka")``,
    derived from contract state."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets_json(
            topic, committed, partitions),
        # retention may expire replayed segments on a real cluster;
        # the contract treats that as a resumable condition, not a
        # query failure
        "failOnDataLoss": "false",
    }
    if max_records_per_partition is not None:
        # the connector's bound is per TRIGGER across partitions;
        # the contract bound is per partition — scale by the fan-out.
        # The connector then splits the budget proportionally to
        # per-partition LAG, not evenly: under skew one partition may
        # exceed the contract's per-partition bound in a trigger
        # (only the trigger TOTAL is hard). See the module docstring.
        opts["maxOffsetsPerTrigger"] = str(
            max_records_per_partition * max(1, len(partitions)))
    return opts


def normalize_kafka_frame(df: DataFrame) -> DataFrame:
    """Kafka wire schema -> the bus contract's RECORD_SCHEMA
    (partition int, offset long, key/value string, ts string), so
    plans written against the canned broker run unchanged."""
    return df.select(
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    ).select([f.name for f in RECORD_SCHEMA.fields])


def read_stream(spark: SparkSession, bootstrap_servers: str,
                topic: str, group_dir: str, partitions: list[int],
                max_records_per_partition: int | None = None
                ) -> DataFrame:
    """The real-cluster entry: resume from the contract's committed
    ledger via the connector. Raises with a pointed message when the
    kafka connector jar is absent (this sandbox); the option
    construction and normalization above carry all the adapter
    logic and are contract-tested without a broker."""
    opts = kafka_options(bootstrap_servers, topic,
                         read_committed(group_dir), partitions,
                         max_records_per_partition)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return normalize_kafka_frame(reader.load())
    except Exception as e:  # pragma: no cover - no jar in sandbox
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to "
            "spark.jars.packages (the canned-broker path "
            "bus_source.fetch_batch serves the same contract "
            "without it)") from e
