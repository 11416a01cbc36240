"""TSDS downsample-on-write (sinks/tsds_rollup.py): merge-on-append
== full rebuild, snapshot versioning, and the serve plan never
touching raw events."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_generator_spark.sinks import snapshots
from parquet_generator_spark.sinks.tsds_rollup import (
    append_rollup,
    serve_rollup,
    train_rollup,
)
from parquet_generator_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return [tuple(r) for r in
            df.orderBy("event_type", "bucket").collect()]


def test_append_equals_rebuild(spark, tmp_path):
    """Split the events by a deterministic hash, train on slice A,
    append slice B: the merged rollup must equal training on the
    whole corpus at once — counts, extremes, UNROUNDED sums, and
    the (ts, id)-adjudicated last value."""
    ev = load_table(spark, "events", SF)
    a = ev.filter(F.crc32(F.col("event_id").cast("string")) % 2
                  == 0)
    b = ev.filter(F.crc32(F.col("event_id").cast("string")) % 2
                  == 1)

    inc_root = str(tmp_path / "inc")
    train_rollup(spark, a, inc_root)
    v = append_rollup(spark, inc_root, b)
    assert v == 2

    full_root = str(tmp_path / "full")
    train_rollup(spark, ev, full_root)

    got = _sorted_rows(serve_rollup(spark, inc_root))
    want = _sorted_rows(serve_rollup(spark, full_root))
    assert got == want and len(got) > 0
    # time travel: version 1 still readable and equals slice A alone
    a_only = _sorted_rows(serve_rollup(spark, inc_root, version=1))
    a_root = str(tmp_path / "a")
    train_rollup(spark, a, a_root)
    assert a_only == _sorted_rows(serve_rollup(spark, a_root))


def test_serve_plan_scans_rollup_not_events(spark, tmp_path):
    """The downsample-on-write point: serving scans the snapshot's
    series x buckets files, never raw events — no window, no raw
    aggregation in the plan."""
    root = str(tmp_path / "r")
    train_rollup(spark, load_table(spark, "events", SF), root)
    df = serve_rollup(spark, root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "events.parquet" not in plan
    assert "FileScan" in plan
    assert "Window" not in plan and "HashAggregate" not in plan
    # the scanned files are the snapshot's data files
    files = list(df.inputFiles())
    assert files and all("rollup_6h" in f for f in files)


def test_served_key_matches_per_query_rollup(spark, tmp_path):
    """Value identity between the materialized rollup and the
    per-query dsl_tsds_downsample (the driver proves the same via
    the shared oracle; this pins it in-suite)."""
    from parquet_generator_spark.plans.reference_queries23 import (
        dsl_tsds_downsample,
    )

    root = str(tmp_path / "r")
    train_rollup(spark, load_table(spark, "events", SF), root)
    got = _sorted_rows(serve_rollup(spark, root))
    want = [tuple(r) for r in dsl_tsds_downsample(spark, SF)
            .collect()]
    assert got == want


def test_merge_is_order_insensitive(spark, tmp_path):
    """Appending slices in either order lands on the same rollup
    (counts/extremes/sum are commutative; the last-value witness
    adjudicates by (ts, id), not arrival order)."""
    ev = load_table(spark, "events", SF)
    h = F.crc32(F.col("event_id").cast("string")) % 3
    s0, s1, s2 = (ev.filter(h == i) for i in range(3))

    r1 = str(tmp_path / "r1")
    train_rollup(spark, s0, r1)
    append_rollup(spark, r1, s1)
    append_rollup(spark, r1, s2)

    r2 = str(tmp_path / "r2")
    train_rollup(spark, s2, r2)
    append_rollup(spark, r2, s0)
    append_rollup(spark, r2, s1)

    assert (_sorted_rows(serve_rollup(spark, r1))
            == _sorted_rows(serve_rollup(spark, r2)))
    assert snapshots.history(str(tmp_path / "r1" / "rollup_6h"))[
        -1]["version"] == 3
