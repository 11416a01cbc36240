"""Kafka-shaped message-bus source: the consumer CONTRACT (topics,
partitions, offsets, commit, replay) pinned against a canned on-disk
broker, the way tests/test_es_contract.py pins the ES wire protocol
against a fake HTTP cluster.

The sandbox cannot run a real broker, and Spark's own kafka source
needs the external connector jar — so this module implements the
exact semantics a broker swap-in must preserve, over a directory
broker:

    <topic_dir>/partition=K/segment-00000001.jsonl
        one JSON record per line: {"offset": n, "key": ..,
        "value": .., "ts": ..}; offsets are dense, ascending,
        PER-PARTITION (the Kafka invariant).

Contract surface (each is a test in tests/test_bus_contract.py):
- partition discovery + fan-out: every partition is an independent
  ordered log; a batch read fans out one task per partition;
- offset semantics: a batch reads [start, end) per partition and
  reports the end offsets; committed offsets resume exactly — no
  gaps, no duplicates;
- replay: re-reading any [start, end) range yields identical
  records forever (logs are immutable);
- at-least-once vs exactly-once: commit-after-sink gives
  at-least-once (a crash between sink and commit redelivers);
  ``exactly_once_sink`` makes sink+commit one atomic publication
  (the Structured Streaming checkpoint pattern), so the crash
  window disappears.

Swapping in a real broker replaces ``fetch_batch``'s file reads with
``consumer.poll`` and ``discover_partitions`` with topic metadata —
the offset bookkeeping, the batch loop, and both sink protocols are
broker-agnostic and stay as-is. With the kafka connector jar on the
cluster, the same plans run on ``spark.readStream.format("kafka")``
directly; this module is the contract test double, not a Kafka
reimplementation.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORD_SCHEMA = T.StructType([
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("offset", T.LongType(), False),
    T.StructField("key", T.StringType(), True),
    T.StructField("value", T.StringType(), True),
    T.StructField("ts", T.StringType(), True),
])


def discover_partitions(topic_dir: str) -> list[int]:
    parts = []
    for d in glob.glob(os.path.join(topic_dir, "partition=*")):
        m = re.match(r"partition=(\d+)$", os.path.basename(d))
        if m:
            parts.append(int(m.group(1)))
    return sorted(parts)


def end_offsets(topic_dir: str) -> dict[int, int]:
    """Next-offset-to-produce per partition (Kafka's endOffsets):
    max committed record offset + 1, or 0 for an empty partition."""
    out = {}
    for p in discover_partitions(topic_dir):
        hi = 0
        for seg in glob.glob(os.path.join(
                topic_dir, f"partition={p}", "segment-*.jsonl")):
            with open(seg) as fh:
                for line in fh:
                    rec = json.loads(line)
                    hi = max(hi, rec["offset"] + 1)
        out[p] = hi
    return out


def fetch_batch(spark: SparkSession, topic_dir: str,
                start: dict[int, int],
                max_records_per_partition: int | None = None
                ) -> tuple[DataFrame, dict[int, int]]:
    """Read [start, end) per partition and return (records, end).
    One task per partition (the fan-out unit, exactly Kafka's); the
    bounded ``max_records_per_partition`` is maxOffsetsPerTrigger.
    A real broker swap-in replaces this body with consumer.poll."""
    parts = discover_partitions(topic_dir)
    end = dict(end_offsets(topic_dir))
    if max_records_per_partition is not None:
        end = {p: min(end[p],
                      start.get(p, 0) + max_records_per_partition)
               for p in parts}
    files = [f for p in parts for f in sorted(glob.glob(os.path.join(
        topic_dir, f"partition={p}", "segment-*.jsonl")))]
    if not files:
        return spark.createDataFrame([], RECORD_SCHEMA), end
    raw = (spark.read.schema(RECORD_SCHEMA).json(files))
    if start:
        lo = F.create_map(*[F.lit(x) for kv in start.items()
                            for x in kv])
        low = F.coalesce(lo.getItem(F.col("partition")), F.lit(0))
    else:
        low = F.lit(0)
    hi = F.create_map(*[F.lit(x) for kv in end.items() for x in kv])
    got = raw.filter(
        (F.col("offset") >= low)
        & (F.col("offset") < hi.getItem(F.col("partition"))))
    # one task per bus partition: the log is already partitioned on
    # disk; repartition by the partition id keeps per-partition order
    # reconstructible by offset (the only order Kafka guarantees)
    return got.repartition(max(1, len(parts)), "partition"), end


# ------------------------------------------------------------------
# offset store (the "consumer group" state)
# ------------------------------------------------------------------

def read_committed(group_dir: str) -> dict[int, int]:
    cur = os.path.join(group_dir, "OFFSETS")
    if not os.path.exists(cur):
        return {}
    with open(cur) as fh:
        return {int(k): v for k, v in json.load(fh).items()}


def commit_offsets(group_dir: str, offsets: dict[int, int]) -> None:
    os.makedirs(group_dir, exist_ok=True)
    tmp = os.path.join(group_dir, f".offsets.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump({str(k): v for k, v in offsets.items()}, fh)
    os.replace(tmp, os.path.join(group_dir, "OFFSETS"))


def consume_once(spark: SparkSession, topic_dir: str, group_dir: str,
                 sink, max_records_per_partition: int | None = None,
                 crash_before_commit: bool = False) -> dict[int, int]:
    """One at-least-once micro-batch: fetch from committed offsets,
    run ``sink(df)``, then commit. A crash between sink and commit
    (simulated by the flag) redelivers the batch — the documented
    at-least-once window."""
    start = read_committed(group_dir)
    df, end = fetch_batch(spark, topic_dir, start,
                          max_records_per_partition)
    sink(df)
    if crash_before_commit:
        raise RuntimeError("simulated crash after sink, before commit")
    commit_offsets(group_dir, end)
    return end


def exactly_once_sink(spark: SparkSession, topic_dir: str,
                      out_dir: str, group_dir: str,
                      max_records_per_partition: int | None = None
                      ) -> dict[int, int]:
    """Exactly-once parquet sink: the batch's data files and its end
    offsets publish in ONE atomic rename (batch directory named by
    the start offsets, so a redelivered batch overwrites its own
    output instead of duplicating — idempotent, the Structured
    Streaming sink-commit pattern)."""
    start = read_committed(group_dir)
    df, end = fetch_batch(spark, topic_dir, start,
                          max_records_per_partition)
    if end == start:
        return end
    batch_id = "-".join(f"{p}_{start.get(p, 0)}" for p in sorted(end))
    staging = os.path.join(out_dir, f"_staging_{uuid.uuid4().hex}")
    final = os.path.join(out_dir, f"batch={batch_id}")
    df.write.mode("overwrite").parquet(staging)
    with open(os.path.join(staging, "_OFFSETS.json"), "w") as fh:
        json.dump({str(k): v for k, v in end.items()}, fh)
    if os.path.exists(final):          # redelivery: replace, not add
        shutil.rmtree(final)
    os.replace(staging, final)         # atomic publication
    commit_offsets(group_dir, end)     # advisory; state recoverable
    return end


def recover_offsets_from_sink(out_dir: str) -> dict[int, int]:
    """Rebuild the committed offsets from the sink's own batch
    directories (the source of truth for exactly-once): max end
    offset per partition across published batches."""
    out: dict[int, int] = {}
    for meta in glob.glob(os.path.join(out_dir, "batch=*",
                                       "_OFFSETS.json")):
        with open(meta) as fh:
            for k, v in json.load(fh).items():
                out[int(k)] = max(out.get(int(k), 0), v)
    return out


# ------------------------------------------------------------------
# canned-broker producer (test fixture helper)
# ------------------------------------------------------------------

def produce(topic_dir: str, partition: int,
            records: list[tuple[str, str, str]]) -> None:
    """Append (key, value, ts) records to a partition as a new
    immutable segment, continuing the partition's dense offsets."""
    pdir = os.path.join(topic_dir, f"partition={partition}")
    os.makedirs(pdir, exist_ok=True)
    base = end_offsets(topic_dir).get(partition, 0)
    n_seg = len(glob.glob(os.path.join(pdir, "segment-*.jsonl")))
    seg = os.path.join(pdir, f"segment-{n_seg + 1:08d}.jsonl")
    with open(seg, "w") as fh:
        for i, (k, v, ts) in enumerate(records):
            fh.write(json.dumps({
                "partition": partition, "offset": base + i,
                "key": k, "value": v, "ts": ts}) + "\n")
