"""Schema evolution and compaction over an ingest-shaped dataset."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_generator_spark.sinks.maintenance import (
    compact_dataset,
    dataset_file_stats,
    file_column_ranges,
    read_evolving,
    sort_for_skipping,
    zorder_by,
)


def test_read_evolving_merges_drifted_schemas(spark, tmp_path):
    path = str(tmp_path / "evolving")
    # batch 1: (id, a); batch 2 adds column b; batch 3 adds c, drops a
    spark.createDataFrame([(1, "x")], "id long, a string") \
        .write.mode("append").parquet(path)
    spark.createDataFrame([(2, "y", 10.0)], "id long, a string, b double") \
        .write.mode("append").parquet(path)
    spark.createDataFrame([(3, True)], "id long, c boolean") \
        .write.mode("append").parquet(path)

    df = read_evolving(spark, path)
    assert set(df.columns) == {"id", "a", "b", "c"}
    rows = {r["id"]: (r["a"], r["b"], r["c"])
            for r in df.orderBy("id").collect()}
    assert rows == {1: ("x", None, None),
                    2: ("y", 10.0, None),
                    3: (None, None, True)}


def test_compact_dataset_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "smallfiles")
    # simulate 3 micro-batch appends, each spraying 8 tiny files
    for batch in range(3):
        (spark.range(batch * 1000, (batch + 1) * 1000)
         .withColumn("v", F.col("id") * 2)
         .repartition(8).write.mode("append").parquet(path))

    before, total_bytes = dataset_file_stats(spark, path)
    assert before >= 24

    df_before = spark.read.parquet(path)
    checksum_before = df_before.agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("v")).collect()[0]

    n_after = compact_dataset(spark, path, target_file_bytes=total_bytes)
    assert n_after < before

    df_after = spark.read.parquet(path)
    checksum_after = df_after.agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("v")).collect()[0]
    assert tuple(checksum_after) == tuple(checksum_before)


def test_sort_for_skipping_tightens_file_stats(spark, tmp_path):
    src = str(tmp_path / "unsorted")
    dst = str(tmp_path / "clustered")
    # every source file contains every category -> no file prunable
    (spark.range(4000)
     .withColumn("category", F.concat(F.lit("cat"), F.col("id") % 8))
     .withColumn("v", F.col("id") * 3)
     .repartition(6).write.parquet(src))
    for lo, hi in file_column_ranges(src, "category"):
        assert lo == "cat0" and hi == "cat7"

    sort_for_skipping(spark, src, dst, ["category", "v"],
                      target_file_bytes=4096)
    ranges = file_column_ranges(dst, "category")
    assert len(ranges) > 1
    # a point filter now skips most files on footer stats alone
    hit = sum(1 for lo, hi in ranges if lo <= "cat3" <= hi)
    assert hit < len(ranges)

    before = spark.read.parquet(src).agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("v")).collect()[0]
    after = spark.read.parquet(dst).agg(
        F.count(F.lit(1)), F.sum("id"), F.sum("v")).collect()[0]
    assert tuple(after) == tuple(before)


def test_zorder_tightens_stats_on_both_columns(spark, tmp_path):
    src = str(tmp_path / "grid_src")
    dst = str(tmp_path / "grid_z")
    # two independent uniform dimensions; row order random w.r.t. both
    (spark.range(20000)
     .withColumn("x", (F.col("id") * 7919) % 1000)
     .withColumn("y", (F.col("id") * 104729) % 1000)
     .repartition(4).write.parquet(src))

    zorder_by(spark, src, dst, ["x", "y"], bits=10,
              target_file_bytes=12 * 1024)
    rx = file_column_ranges(dst, "x")
    ry = file_column_ranges(dst, "y")
    assert len(rx) >= 8
    # most files cover well under the full 0..999 span on BOTH dims —
    # a hierarchical sort would leave y at (almost) full span in every
    # x stripe
    tight_x = sum(1 for lo, hi in rx if hi - lo <= 600)
    tight_y = sum(1 for lo, hi in ry if hi - lo <= 600)
    assert tight_x >= len(rx) * 0.6
    assert tight_y >= len(ry) * 0.6

    before = spark.read.parquet(src).agg(
        F.count(F.lit(1)), F.sum("x"), F.sum("y")).collect()[0]
    after = spark.read.parquet(dst).agg(
        F.count(F.lit(1)), F.sum("x"), F.sum("y")).collect()[0]
    assert tuple(after) == tuple(before)


def test_overwrite_partition_touches_only_its_days(spark, tmp_path):
    from parquet_generator_spark.sinks.maintenance import (
        overwrite_partition,
    )

    path = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [(d, i, float(i)) for d in ("d1", "d2", "d3") for i in range(10)],
        "day string, k int, v double")
    base.write.partitionBy("day").parquet(path)

    # backfill day d2 only, with corrected (fewer, different) rows
    fix = spark.createDataFrame(
        [("d2", 99, -1.0)], "day string, k int, v double")
    overwrite_partition(fix, path, "day")

    out = spark.read.parquet(path)
    per_day = {r["day"]: r["n"] for r in
               out.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    assert per_day == {"d1": 10, "d2": 1, "d3": 10}
    assert out.filter("day = 'd2'").collect()[0]["k"] == 99


def test_bloom_filter_written_to_parquet_file(spark, tmp_path):
    # this pyarrow build doesn't expose bloom_filter_offset in column
    # metadata, so verify physically: the bloom-filtered file must
    # carry the filter's extra bytes (~ndv bits) vs a plain write of
    # the identical data
    import glob

    from parquet_generator_spark.sinks.maintenance import (
        write_with_bloom_filters,
    )

    df = spark.range(0, 10_000).selectExpr(
        "id AS k", "cast(id % 97 AS int) AS v").coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.write.parquet(plain)
    write_with_bloom_filters(df, bloomed, ["k"], ndv=10_000)

    def pq_bytes(d):
        return sum(__import__("os").path.getsize(f)
                   for f in glob.glob(d + "/*.parquet"))

    extra = pq_bytes(bloomed) - pq_bytes(plain)
    # a 10k-ndv bloom filter is several KiB; identical data otherwise
    assert extra > 2048, f"expected bloom bytes, got delta {extra}"
    # and the data still reads back identically
    assert (spark.read.parquet(bloomed).orderBy("k").collect()
            == spark.read.parquet(plain).orderBy("k").collect())


def test_targeted_delete_unpartitioned(spark, tmp_path):
    from parquet_generator_spark.sinks.maintenance import (
        targeted_delete,
    )
    p = str(tmp_path / "t")
    spark.range(100).withColumnRenamed("id", "user_id") \
        .withColumn("v", F.col("user_id") * 2).write.parquet(p)
    doomed = spark.createDataFrame([(3,), (7,), (999,)], "k long")
    removed = targeted_delete(spark, p, "user_id", doomed)
    assert removed == 2
    left = spark.read.parquet(p)
    assert left.count() == 98
    assert left.filter(F.col("user_id").isin(3, 7)).count() == 0


def test_targeted_delete_partitioned_rewrites_only_affected(
        spark, tmp_path):
    from parquet_generator_spark.sinks.maintenance import (
        targeted_delete,
    )
    p = str(tmp_path / "t")
    df = (spark.range(100).withColumnRenamed("id", "user_id")
          .withColumn("day", (F.col("user_id") % 4).cast("string")))
    df.write.partitionBy("day").parquet(p)
    import os
    import time
    # record mtimes of untouched partitions (day=1, day=3)
    untouched = {}
    for d in ("day=1", "day=3"):
        dirp = os.path.join(p, d)
        untouched[d] = max(os.path.getmtime(os.path.join(dirp, f))
                           for f in os.listdir(dirp))
    time.sleep(1.1)
    doomed = spark.createDataFrame([(0,), (4,), (2,)], "k long")
    removed = targeted_delete(spark, p, "user_id", doomed,
                              partition_col="day")
    assert removed == 3
    left = spark.read.parquet(p)
    assert left.count() == 97
    assert left.filter(F.col("user_id").isin(0, 2, 4)).count() == 0
    # keys 0,4 live in day=0; key 2 in day=2 — days 1 and 3 untouched
    for d, mt in untouched.items():
        dirp = os.path.join(p, d)
        now = max(os.path.getmtime(os.path.join(dirp, f))
                  for f in os.listdir(dirp))
        assert now == mt, f"{d} was rewritten"


def test_targeted_delete_fully_deleted_partition_is_removed(
        spark, tmp_path):
    """ADVICE r5 regression: a partition whose EVERY row matches a
    doomed key contributes zero rows to the rewrite frame, so dynamic
    partition overwrite alone never touched it and the data silently
    survived on disk. The fix removes such directories explicitly."""
    import os

    from parquet_generator_spark.sinks.maintenance import (
        targeted_delete,
    )
    p = str(tmp_path / "t")
    df = (spark.range(12).withColumnRenamed("id", "user_id")
          .withColumn("day", (F.col("user_id") % 3).cast("string")))
    df.write.partitionBy("day").parquet(p)
    # every key of day=0 (0,3,6,9) doomed + one key of day=1 (4)
    doomed = spark.createDataFrame(
        [(0,), (3,), (6,), (9,), (4,)], "k long")
    removed = targeted_delete(spark, p, "user_id", doomed,
                              partition_col="day")
    assert removed == 5
    assert not os.path.isdir(os.path.join(p, "day=0")), \
        "fully-deleted partition's files survived on disk"
    left = spark.read.parquet(p)
    assert left.count() == 7
    assert left.filter(F.col("user_id").isin(0, 3, 6, 9, 4)).count() == 0


def test_targeted_delete_all_partitions_fully_deleted(spark, tmp_path):
    """Edge: every row of every partition doomed — the dataset ends
    empty, the count still balances, and no directory survives."""
    import os

    from parquet_generator_spark.sinks.maintenance import (
        targeted_delete,
    )
    p = str(tmp_path / "t")
    df = (spark.range(6).withColumnRenamed("id", "user_id")
          .withColumn("day", (F.col("user_id") % 2).cast("string")))
    df.write.partitionBy("day").parquet(p)
    doomed = spark.createDataFrame([(i,) for i in range(6)], "k long")
    removed = targeted_delete(spark, p, "user_id", doomed,
                              partition_col="day")
    assert removed == 6
    assert not any(d.startswith("day=") for d in os.listdir(p))


def test_retention_expire_drops_only_old_partitions(spark, tmp_path):
    import os
    import time

    from parquet_generator_spark.sinks.maintenance import (
        retention_expire,
    )
    p = str(tmp_path / "t")
    df = (spark.range(40).withColumnRenamed("id", "k")
          .withColumn("day", F.concat(F.lit("2024-01-0"),
                                      (F.col("k") % 4 + 1))))
    df.write.partitionBy("day").parquet(p)
    survivors = {}
    for d in ("day=2024-01-03", "day=2024-01-04"):
        dirp = os.path.join(p, d)
        survivors[d] = max(os.path.getmtime(os.path.join(dirp, f))
                           for f in os.listdir(dirp))
    time.sleep(1.1)
    dropped = retention_expire(spark, p, "day", "2024-01-03")
    assert dropped == 2
    left = spark.read.parquet(p)
    assert left.select("day").distinct().count() == 2
    assert left.filter(F.col("day") < "2024-01-03").count() == 0
    # surviving partitions untouched (no rewrite, not even a re-stat)
    for d, mt in survivors.items():
        dirp = os.path.join(p, d)
        now = max(os.path.getmtime(os.path.join(dirp, f))
                  for f in os.listdir(dirp))
        assert now == mt, f"{d} was rewritten"
