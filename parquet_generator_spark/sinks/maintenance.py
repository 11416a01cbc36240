"""Dataset maintenance: schema-evolution reads and small-file
compaction.

Both are consequences of continuous ingest (the reference's loop, our
streaming sink): upstream adds fields over time, and micro-batches
leave many small files. At 100 TB unmaintained small files dominate
scan cost (per-file open + footer read + scheduling beats actual IO).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Read a dataset whose batches have drifting schemas: mergeSchema
    unions all fields (missing ones null-filled) — the read-side twin
    of schema.infer's merge/widen, and the lenient-decode contract the
    reference's ExtendedJsonDecoder enforced doc-by-doc."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def dataset_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet files under ``path``."""
    n_files = 0
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n_files += 1
                total += os.path.getsize(os.path.join(root, f))
    return n_files, total


def sort_for_skipping(spark: SparkSession, src_path: str, dest_path: str,
                      cols: list[str],
                      target_file_bytes: int = 128 * 1024 * 1024) -> None:
    """Rewrite a dataset range-partitioned + sorted by ``cols`` so
    parquet min/max stats become selective on them — the open-format
    analogue of clustering a table on its dominant filter keys.

    After the rewrite a filter on the leading column prunes whole
    files (ranges are disjoint across output files) and row groups
    within files (stats are tight because values are contiguous).
    One range shuffle; sort is per-partition, no global sort barrier.
    """
    df = spark.read.parquet(src_path)
    _n, total_bytes = dataset_file_stats(spark, src_path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    (df.repartitionByRange(n_out, *cols)
     .sortWithinPartitions(*cols)
     .write.mode("overwrite").parquet(dest_path))


def zorder_by(spark: SparkSession, src_path: str, dest_path: str,
              cols: list[str], bits: int = 10,
              target_file_bytes: int = 128 * 1024 * 1024) -> None:
    """Rewrite a dataset ordered by the Morton (Z-order) interleaving
    of ``cols`` so footer min/max stats are selective on EVERY listed
    column at once — hierarchical sort (sort_for_skipping) only tightens
    the leading column; Z-order trades a little per-column tightness
    for simultaneous multi-column skipping.

    Numeric columns only: each value is min-max normalized onto a
    2^bits grid (one tiny stats aggregate supplies the bounds as
    literals), then bits interleave via a generated Catalyst
    expression — pure codegen, no UDF. One range shuffle on the
    Z value; per-partition sort; no global barrier.
    """
    df = spark.read.parquet(src_path)
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols]).collect()[0]
    grid = (1 << bits) - 1
    gexprs = []
    for c in cols:
        mn = float(stats[f"mn_{c}"])
        span = float(stats[f"mx_{c}"]) - mn
        if span <= 0:
            gexprs.append("cast(0 AS BIGINT)")
        else:
            gexprs.append(
                f"cast(round((cast({c} AS DOUBLE) - {mn!r}) / {span!r} "
                f"* {grid}) AS BIGINT)")
    k = len(cols)
    terms = [f"shiftleft(shiftright({g}, {i}) % 2, {i * k + j})"
             for j, g in enumerate(gexprs) for i in range(bits)]
    z = F.expr(" + ".join(terms))
    _n, total_bytes = dataset_file_stats(spark, src_path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    (df.withColumn("_z", z)
     .repartitionByRange(n_out, "_z")
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(dest_path))


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per parquet file under ``path``, from
    footer statistics — the same stats a scan uses for skipping."""
    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    if col.path_in_schema == column and col.statistics:
                        mins.append(col.statistics.min)
                        maxs.append(col.statistics.max)
            if mins:
                out.append((min(mins), max(maxs)))
    return out


def compact_dataset(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite a small-files dataset into ~target-size files; returns
    the new file count. Coalesce (not repartition) so the rewrite is
    shuffle-free; the staging swap keeps readers from seeing a
    half-written dataset. On a real deployment this runs per
    partition directory, oldest-first, off the ingest path."""
    df = read_evolving(spark, path)
    _n, total_bytes = dataset_file_stats(spark, path)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    staging = path + "_compacting"
    df.coalesce(n_out).write.mode("overwrite").parquet(staging)
    import shutil
    shutil.rmtree(path)
    os.replace(staging, path)
    n_after, _ = dataset_file_stats(spark, path)
    return n_after


def overwrite_partition(df: DataFrame, path: str,
                        partition_col: str) -> None:
    """Idempotent backfill: rewrite ONLY the partitions present in
    ``df`` (dynamic partition overwrite), leaving every other
    partition untouched — the correct re-run semantics for a failed
    or corrected day. Static overwrite mode would drop the whole
    dataset; this drops exactly the partitions being replaced, so a
    daily backfill at 100 TB touches one day's files, not 100 TB."""
    (df.write
     .mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy(partition_col)
     .parquet(path))


def write_with_bloom_filters(df: DataFrame, path: str,
                             columns: list[str],
                             ndv: int = 100_000) -> None:
    """Write parquet with per-column bloom filters: point-lookup
    predicates (key = X) on these columns can skip row groups whose
    bloom filter proves absence — min/max stats can't help when the
    key space is uniformly spread across files. ``ndv`` sizes the
    filter (expected distinct values per row group)."""
    w = df.write.mode("overwrite")
    for c in columns:
        w = (w.option(f"parquet.bloom.filter.enabled#{c}", "true")
             .option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)))
    w.parquet(path)


def _escape_partition_value(v) -> str:
    """Partition value -> directory-name fragment, matching Spark's
    ExternalCatalogUtils.escapePathName (percent-encode the reserved
    char set + control chars; null -> the Hive default partition)."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    reserved = set('"#%\'*/:=?\\\x7f{[]^')
    return "".join(
        f"%{ord(ch):02X}" if ch in reserved or ord(ch) < 32 else ch
        for ch in str(v))


def targeted_delete(spark: SparkSession, path: str, key_col: str,
                    keys_df: DataFrame,
                    partition_col: str | None = None) -> int:
    """Right-to-be-forgotten delete: rewrite the dataset WITHOUT the
    rows whose ``key_col`` appears in ``keys_df`` (a left-anti join),
    via the same staging swap the compactor uses. Returns the number
    of rows removed.

    Scale posture: when ``partition_col`` is given, only partitions
    that actually CONTAIN a doomed key are rewritten (dynamic
    partition overwrite over the affected-partition semi-join) — a
    deletion of a handful of users at 100 TB rewrites their
    partitions, not the table. A partition whose EVERY row matches a
    doomed key contributes nothing to the rewrite frame, so dynamic
    overwrite alone would leave its files — the worst failure mode
    for this operation — hence the explicit affected-minus-surviving
    directory removal below. Without ``partition_col`` the whole
    dataset is rewritten once — the fallback for unpartitioned
    layouts. This is the DELETE a table format runs natively; the
    plan above the writer is identical.
    """
    import shutil

    df = read_evolving(spark, path)
    keys = keys_df.select(F.col(keys_df.columns[0]).alias(key_col)) \
        .distinct()
    before = df.count()
    if partition_col is None:
        kept = df.join(keys, key_col, "left_anti")
        staging = path + "_deleting"
        kept.write.mode("overwrite").parquet(staging)
        shutil.rmtree(path)
        os.replace(staging, path)
    else:
        affected = (df.join(keys, key_col, "left_semi")
                    .select(partition_col).distinct())
        # partition-cardinality metadata, bounded like a SHOW
        # PARTITIONS result — not data rows
        affected_vals = [r[0] for r in affected.collect()]
        kept = (df.join(F.broadcast(affected), partition_col,
                        "left_semi")
                .join(keys, key_col, "left_anti"))
        surviving = {r[0] for r in
                     kept.select(partition_col).distinct().collect()}
        if surviving:
            overwrite_partition(kept.repartition(partition_col),
                                path, partition_col)
        for v in affected_vals:
            if v in surviving:
                continue  # rewritten (smaller) by the overwrite above
            d = os.path.join(
                path, f"{partition_col}={_escape_partition_value(v)}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    n_files, _ = dataset_file_stats(spark, path)
    after = read_evolving(spark, path).count() if n_files else 0
    return before - after


def retention_expire(spark: SparkSession, path: str,
                     partition_col: str, keep_from: str) -> int:
    """Retention enforcement: DROP every partition whose key is
    strictly below ``keep_from`` (ISO date / lexicographic cutoff) —
    the TTL a log/corpus table runs nightly. Pure partition-metadata
    operation: directories below the cutoff are removed; no file in
    a surviving partition is read or rewritten, which is what makes
    retention O(expired partitions), not O(table), at 100 TB.
    Returns the number of partitions dropped."""
    import shutil

    prefix = partition_col + "="
    dropped = 0
    for d in sorted(os.listdir(path)):
        if not d.startswith(prefix):
            continue
        value = d[len(prefix):]
        if value != "__HIVE_DEFAULT_PARTITION__" and value < keep_from:
            shutil.rmtree(os.path.join(path, d))
            dropped += 1
    return dropped
