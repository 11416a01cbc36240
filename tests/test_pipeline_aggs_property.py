"""Property test: the pipeline-agg window implementations
(derivative / cumulative_sum / moving_fn / bucket_script /
bucket_selector / bucket_sort) agree with an independent pure-Python
evaluator over randomly generated histogram bucket frames."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_generator_spark.operators.esdsl import search

# random per-bucket (key, doc rows): keys are histogram bins of `v`
_frames = st.lists(
    st.tuples(st.integers(min_value=0, max_value=6),      # bin index
              st.integers(min_value=1, max_value=400)),   # metric value
    min_size=1, max_size=25)


def _buckets(rows):
    """Python reference: histogram buckets of interval 10 over v with
    sum metric, key ascending."""
    agg = {}
    for b, v in rows:
        k = float(b * 10)
        cnt, s = agg.get(k, (0, 0.0))
        agg[k] = (cnt + 1, s + float(v))
    return [
        {"key": k, "doc_count": c, "total": round(s, 4)}
        for k, (c, s) in sorted(agg.items())
    ]


def _ref_pipelines(buckets, window):
    out = []
    run = 0.0
    for i, b in enumerate(buckets):
        b = dict(b)
        prev = buckets[i - 1]["total"] if i else None
        b["deriv"] = (round(b["total"] - prev, 4)
                      if prev is not None else None)
        run += b["total"]
        b["cum"] = round(run, 4)
        lo = max(0, i - (window - 1))
        vals = [x["total"] for x in buckets[lo:i + 1]]
        b["ma"] = round(sum(vals) / len(vals), 4)
        b["ratio"] = round(b["total"] / b["doc_count"], 4)
        out.append(b)
    return out


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_frames, window=st.integers(min_value=1, max_value=5),
       min_count=st.integers(min_value=1, max_value=3))
def test_pipeline_aggs_match_reference(spark, rows, window, min_count):
    df = (spark.createDataFrame(rows, "b int, v int")
          .selectExpr("CAST(b * 10 + 0.5 AS DOUBLE) AS val", "v"))
    got = search(df, {
        "query": {"match_all": {}},
        "aggs": {"bins": {
            "histogram": {"field": "val", "interval": 10},
            "aggs": {
                "total": {"sum": {"field": "v"}},
                "deriv": {"derivative": {"buckets_path": "total"}},
                "cum": {"cumulative_sum": {"buckets_path": "total"}},
                "ma": {"moving_fn": {"buckets_path": "total",
                                     "window": window}},
                "ratio": {"bucket_script":
                          {"expr": "total / doc_count"}},
                "keep": {"bucket_selector":
                         {"expr": f"doc_count >= {min_count}"}},
            },
        }},
    }).collect()

    ref = [b for b in _ref_pipelines(_buckets(rows), window)
           if b["doc_count"] >= min_count]
    assert len(got) == len(ref)
    for g, r in zip(sorted(got, key=lambda x: x["key"]), ref):
        assert float(g["key"]) == r["key"]
        assert g["doc_count"] == r["doc_count"]
        for f in ("total", "cum", "ma", "ratio"):
            assert math.isclose(g[f], r[f], abs_tol=1e-6), (f, g, r)
        if r["deriv"] is None:
            assert g["deriv"] is None
        else:
            assert math.isclose(g["deriv"], r["deriv"], abs_tol=1e-6)
