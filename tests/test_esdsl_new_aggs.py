"""Semantics tests for the fourth tranche of ES-DSL agg kinds:
weighted_avg, top_metrics, rare_terms, adjacency_matrix, serial_diff,
stats_bucket, cumulative_cardinality."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import search


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


def _frame(spark):
    rows = [
        # (id, ts, kind, v, w)
        (1, _ts(1, 1), "a", 10.0, 1.0),
        (2, _ts(1, 2), "a", 20.0, 3.0),
        (3, _ts(2, 1), "a", 30.0, 1.0),
        (4, _ts(2, 2), "b", 40.0, 2.0),
        (5, _ts(2, 2), "b", 50.0, 2.0),  # ts tie with id 4
        (6, _ts(3, 1), "c", 60.0, 1.0),
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, "
                                       "kind string, v double, w double")


def test_weighted_avg(spark):
    out = search(_frame(spark), {
        "aggs": {"wavg": {"weighted_avg": {"value": {"field": "v"},
                                           "weight": {"field": "w"}}}},
    }).collect()
    # sum(v*w)=10+60+30+80+100+60=340, sum(w)=10
    assert out[0]["wavg"] == 34.0


def test_top_metrics_desc_with_tie_break(spark):
    out = search(_frame(spark), {
        "aggs": {"by_kind": {
            "terms": {"field": "kind", "size": 10},
            "aggs": {"last_v": {"top_metrics": {
                "metrics": {"field": "v"},
                "sort": {"ts": "desc"}, "tie_break": "id"}}},
        }},
    }).collect()
    got = {r["key"]: r["last_v"] for r in out}
    # kind b: ids 4 and 5 share the max ts; tie_break picks id 5
    assert got == {"a": 30.0, "b": 50.0, "c": 60.0}


def test_top_metrics_asc(spark):
    out = search(_frame(spark), {
        "aggs": {"first_v": {"top_metrics": {
            "metrics": {"field": "v"}, "sort": {"ts": "asc"}}}},
    }).collect()
    assert out[0]["first_v"] == 10.0


def test_rare_terms_max_doc_count(spark):
    out = search(_frame(spark), {
        "aggs": {"rare": {"rare_terms": {"field": "kind",
                                         "max_doc_count": 2}}},
    }).collect()
    # a has 3 docs (excluded); b has 2, c has 1 — ascending count
    assert [(r["key"], r["doc_count"]) for r in out] == \
        [("c", 1), ("b", 2)]


def test_adjacency_matrix_pairs(spark):
    out = search(_frame(spark), {
        "aggs": {"adj": {"adjacency_matrix": {"filters": {
            "big": {"range": {"v": {"gte": 40}}},
            "kb": {"term": {"kind": "b"}},
        }}}},
    }).collect()
    got = {r["key"]: r["doc_count"] for r in out}
    assert got == {"big": 3, "big&kb": 2, "kb": 2}


def test_serial_diff_lag(spark):
    out = search(_frame(spark), {
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"s": {"sum": {"field": "v"}},
                     "d2": {"serial_diff": {"buckets_path": "s",
                                            "lag": 2}}},
        }},
    }).collect()
    # day sums: 30, 120, 60 -> lag-2 diff: None, None, 30
    assert [r["d2"] for r in out] == [None, None, 30.0]


def test_stats_bucket_expands_five_columns(spark):
    out = search(_frame(spark), {
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"s": {"sum": {"field": "v"}}},
            },
            "st": {"stats_bucket": {"buckets_path": "per_day>s"}},
        },
    }).collect()
    r = out[0]
    assert (r["st_count"], r["st_min"], r["st_max"], r["st_avg"],
            r["st_sum"]) == (3, 30.0, 120.0, 70.0, 210.0)


def test_cumulative_cardinality_counts_first_occurrences(spark):
    # user u1 appears on days 1 and 2; u2 on day 2; u3 on day 3
    rows = [(1, _ts(1), "u1"), (2, _ts(2), "u1"),
            (3, _ts(2), "u2"), (4, _ts(3), "u3")]
    df = spark.createDataFrame(rows, "id long, ts timestamp, u string")
    out = search(df, {
        "aggs": {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"seen": {"cumulative_cardinality": {"field": "u"}}},
        }},
    }).collect()
    assert [r["seen"] for r in out] == [1, 2, 3]
    assert [r["doc_count"] for r in out] == [1, 2, 1]


def test_multi_terms_combination_buckets(spark):
    out = search(_frame(spark), {
        "aggs": {"mt": {
            "multi_terms": {"terms": [{"field": "kind"},
                                      {"field": "w"}], "size": 10},
        }},
    }).collect()
    got = {r["key"]: r["doc_count"] for r in out}
    assert got == {"a|1.0": 2, "a|3.0": 1, "b|2.0": 2, "c|1.0": 1}


def test_auto_date_histogram_picks_finest_fitting_unit(spark):
    # 3 distinct days within one week; target 5 -> day fits (3 <= 5)
    out = search(_frame(spark), {
        "aggs": {"auto": {"auto_date_histogram": {"field": "ts",
                                                  "buckets": 5}}},
    }).collect()
    assert {r["interval_unit"] for r in out} == {"day"}
    assert [r["doc_count"] for r in out] == [2, 3, 1]
    # target 2 -> day (3 buckets) no longer fits, week (1) does
    out2 = search(_frame(spark), {
        "aggs": {"auto": {"auto_date_histogram": {"field": "ts",
                                                  "buckets": 2}}},
    }).collect()
    assert [(r["interval_unit"], r["doc_count"]) for r in out2] == \
        [("week", 6)]


def test_auto_date_histogram_empty_input(spark):
    out = search(_frame(spark), {
        "query": {"term": {"kind": "zzz"}},
        "aggs": {"auto": {"auto_date_histogram": {"field": "ts",
                                                  "buckets": 5}}},
    }).collect()
    assert out == []


def test_runtime_mapping_usable_in_query_and_agg(spark):
    out = search(_frame(spark), {
        "runtime_mappings": {"vw": {"expr": "v * w"}},
        "query": {"range": {"vw": {"gte": 60}}},
        "aggs": {"total": {"sum": {"field": "vw"}}},
    }).collect()
    # vw: 10,60,30,80,100,60 -> >=60: 60+80+100+60 = 300
    assert out[0]["total"] == 300.0


def test_search_after_keyset_pagination(spark):
    body = {"sort": [{"v": "desc"}, {"id": "asc"}], "size": 2}
    page1 = search(_frame(spark), body).collect()
    assert [(r["v"], r["id"]) for r in page1] == [(60.0, 6), (50.0, 5)]
    body2 = dict(body, search_after=[page1[-1]["v"], page1[-1]["id"]])
    page2 = search(_frame(spark), body2).collect()
    assert [(r["v"], r["id"]) for r in page2] == [(40.0, 4), (30.0, 3)]


def test_search_after_sort_is_take_ordered(spark):
    import contextlib
    import io

    df = search(_frame(spark), {
        "sort": [{"v": "desc"}, {"id": "asc"}], "size": 2})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_terms_include_exclude_regex(spark):
    out = search(_frame(spark), {
        "aggs": {"ks": {"terms": {"field": "kind", "size": 10,
                                  "include": "a|b", "exclude": "b"}}},
    }).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("a", 3)]


def test_histogram_zerofill_includes_empty_bins(spark):
    out = search(_frame(spark), {
        "aggs": {"bins": {"histogram": {"field": "v", "interval": 20,
                                        "min_doc_count": 0}}},
    }).collect()
    # v: 10..60 -> bins 0,20,40,60; bin 0 has v=10, bin 20 has 20/30,
    # bin 40 has 40/50, bin 60 has 60 — no empties here, so check a
    # filtered sparse case too
    assert [(r["key"], r["doc_count"]) for r in out] == \
        [(0.0, 1), (20.0, 2), (40.0, 2), (60.0, 1)]
    out2 = search(_frame(spark), {
        "query": {"terms": {"v": [10.0, 60.0]}},
        "aggs": {"bins": {"histogram": {"field": "v", "interval": 20,
                                        "min_doc_count": 0}}},
    }).collect()
    # only 10 and 60 survive: bins 20 and 40 must appear with 0
    assert [(r["key"], r["doc_count"]) for r in out2] == \
        [(0.0, 1), (20.0, 0), (40.0, 0), (60.0, 1)]
