"""SCD Type-2 merge semantics across consecutive merges: history
preserved, current rows swapped only on real change, null-safe
attribute comparison."""

from __future__ import annotations

import datetime

from parquet_generator_spark.streaming.scd2 import scd2_merge


def _ts(month, day=1):
    return datetime.datetime(2024, month, day)


def test_scd2_two_merges_build_history(spark):
    existing = spark.createDataFrame(
        [(1, "gold", _ts(1), None), (2, "silver", _ts(1), None)],
        "k long, tier string, valid_from timestamp, valid_to timestamp")
    # merge 1: key 1 changes, key 3 is new, key 2 untouched
    b1 = spark.createDataFrame(
        [(1, "platinum", _ts(2)), (2, "silver", _ts(2)),
         (3, "bronze", _ts(2))],
        "k long, tier string, ts timestamp")
    m1 = scd2_merge(existing, b1, ["k"], ["tier"])
    got1 = {(r["k"], r["tier"], r["valid_to"] is None)
            for r in m1.collect()}
    assert got1 == {
        (1, "gold", False),      # closed
        (1, "platinum", True),   # new current
        (2, "silver", True),     # unchanged
        (3, "bronze", True),     # opened
    }

    # merge 2: key 1 reverts; a key absent from the batch survives
    b2 = spark.createDataFrame([(1, "gold", _ts(3))],
                               "k long, tier string, ts timestamp")
    m2 = scd2_merge(m1, b2, ["k"], ["tier"])
    rows = m2.collect()
    k1 = sorted(((r["tier"], r["valid_to"] is None)
                 for r in rows if r["k"] == 1))
    assert k1 == [("gold", False), ("gold", True), ("platinum", False)]
    assert {(r["k"], r["valid_to"] is None) for r in rows if r["k"] != 1} \
        == {(2, True), (3, True)}


def test_scd2_null_safe_change_detection(spark):
    existing = spark.createDataFrame(
        [(1, None, _ts(1), None)],
        "k long, tier string, valid_from timestamp, valid_to timestamp")
    # NULL -> NULL is NOT a change; NULL -> value is
    same = spark.createDataFrame([(1, None, _ts(2))],
                                 "k long, tier string, ts timestamp")
    out = scd2_merge(existing, same, ["k"], ["tier"]).collect()
    assert len(out) == 1 and out[0]["valid_to"] is None

    diff = spark.createDataFrame([(1, "gold", _ts(2))],
                                 "k long, tier string, ts timestamp")
    out2 = scd2_merge(existing, diff, ["k"], ["tier"]).collect()
    assert {(r["tier"], r["valid_to"] is None) for r in out2} \
        == {(None, False), ("gold", True)}
