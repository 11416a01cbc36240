"""IP/CIDR query support: packed-int helpers, CIDR term/range
translation, malformed-string null-safety, and the ip_range agg's
overlap + zero-fill contract."""

from __future__ import annotations

import pytest

from parquet_generator_spark.operators import esdsl
from parquet_generator_spark.operators.esdsl import (
    cidr_bounds,
    ip_range_agg,
    ip_to_int,
    translate_query,
)

ROWS = [
    (1, "10.0.0.1"),
    (2, "10.255.255.255"),
    (3, "9.255.255.255"),     # dotted-STRING order would sort after 10.*
    (4, "192.168.3.4"),
    (5, "192.169.0.1"),
    (6, "not-an-ip"),
    (7, None),
]


@pytest.fixture(scope="module")
def ips(spark):
    return spark.createDataFrame(ROWS, "id long, addr string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_packing_and_bounds():
    assert ip_to_int("10.0.0.1") == (10 << 24) + 1
    assert cidr_bounds("10.0.0.0/8") == (10 << 24, (11 << 24) - 1)
    assert cidr_bounds("192.168.0.0/16") == (
        (192 << 24) + (168 << 16), (192 << 24) + (169 << 16) - 1)
    assert cidr_bounds("0.0.0.0/0") == (0, (1 << 32) - 1)
    with pytest.raises(ValueError):
        ip_to_int("1.2.3.999")
    with pytest.raises(ValueError):
        cidr_bounds("10.0.0.0/40")


def test_cidr_term_and_terms(ips):
    got = ips.filter(translate_query(
        {"term": {"addr": "10.0.0.0/8"}}))
    assert _ids(got) == [1, 2]
    got = ips.filter(translate_query(
        {"terms": {"addr": ["192.168.0.0/16", "9.255.255.255"]}}))
    assert _ids(got) == [3, 4]


def test_ip_range_compares_packed_int_not_string(ips):
    # '9.255.255.255' < '10.0.0.0' numerically; string order disagrees
    got = ips.filter(translate_query(
        {"range": {"addr": {"lt": "10.0.0.0"}}}))
    assert _ids(got) == [3]
    got = ips.filter(translate_query(
        {"range": {"addr": {"gte": "10.0.0.1",
                            "lte": "192.168.255.255"}}}))
    assert _ids(got) == [1, 2, 4]


def test_malformed_and_null_never_match(ips):
    for q in ({"term": {"addr": "10.0.0.0/8"}},
              {"range": {"addr": {"gte": "0.0.0.0"}}}):
        assert 6 not in _ids(ips.filter(translate_query(q)))
        assert 7 not in _ids(ips.filter(translate_query(q)))


def test_ip_range_agg_overlap_and_zero_fill(ips):
    out = ip_range_agg(ips, "addr", [
        {"key": "ten", "mask": "10.0.0.0/8"},
        {"key": "all", "from": "0.0.0.0"},          # overlaps every row
        {"key": "none", "to": "1.0.0.0"},           # empty -> 0
        {"key": "mid", "from": "10.0.0.1", "to": "10.255.255.255"},
    ])
    got = {r["key"]: r["doc_count"] for r in out.collect()}
    # 5 parseable IPs; 'to' is EXCLUSIVE so row 2 is out of 'mid'
    assert got == {"ten": 2, "all": 5, "none": 0, "mid": 1}


def test_ip_prefix_agg_networks_and_min_docs(ips):
    out = esdsl.ip_prefix_agg(ips, "addr", 8).collect()
    # malformed + null dropped; /8 networks in ascending address order
    assert [(r["key"], r["prefix_length"], r["doc_count"])
            for r in out] == [
        ("9.0.0.0", 8, 1), ("10.0.0.0", 8, 2), ("192.0.0.0", 8, 2)]
    pruned = esdsl.ip_prefix_agg(ips, "addr", 8, min_doc_count=2)
    assert [r["key"] for r in pruned.collect()] == ["10.0.0.0",
                                                    "192.0.0.0"]


def test_ip_prefix_agg_full_and_zero_length(ips):
    # /32 = exact addresses; /0 = one global bucket of all parseable
    exact = esdsl.ip_prefix_agg(ips, "addr", 32).collect()
    assert len(exact) == 5 and exact[0]["key"] == "9.255.255.255"
    world = esdsl.ip_prefix_agg(ips, "addr", 0).collect()
    assert [(r["key"], r["doc_count"]) for r in world] == [
        ("0.0.0.0", 5)]


def test_ip_prefix_agg_rejects_bad_length(ips):
    with pytest.raises(ValueError):
        esdsl.ip_prefix_agg(ips, "addr", 33)


# --- anchored date math (lives here with the other leaf-literal
# translation tests) -------------------------------------------------

def test_date_math_steps_and_floor():
    from datetime import datetime as DT

    from parquet_generator_spark.operators.esdsl import resolve_date_math

    assert resolve_date_math("2024-01-31||-2w/d", "gte") == DT(2024, 1, 17)
    # month add clamps to the target month's last day (ES semantics)
    assert resolve_date_math("2024-01-31||+1M", "gte") == DT(2024, 2, 29)
    # /w floors to Monday (2024-01-31 is a Wednesday)
    assert resolve_date_math("2024-01-31||/w", "gte") == DT(2024, 1, 29)
    # gte/lt take the unit start; gt/lte its last microsecond
    assert resolve_date_math("2024-01-05||/M", "lt") == DT(2024, 1, 1)
    assert (resolve_date_math("2024-01-05||/M", "lte")
            == DT(2024, 1, 31, 23, 59, 59, 999999))
    assert (resolve_date_math("2024-01-05||/d", "gt")
            == DT(2024, 1, 5, 23, 59, 59, 999999))
    # time-of-day anchors parse too
    assert (resolve_date_math("2024-01-05T10:30||+2h", "gte")
            == DT(2024, 1, 5, 12, 30))


def test_date_math_rejects_now_and_garbage():
    from parquet_generator_spark.operators.esdsl import (
        is_date_math,
        resolve_date_math,
    )

    # without an injected clock, now-anchors are still refused
    with pytest.raises(ValueError, match="now-anchored"):
        is_date_math("now-7d/d")
    with pytest.raises(ValueError, match="now-anchored"):
        resolve_date_math("now-7d/d", "gte")
    with pytest.raises(ValueError, match="bad date-math"):
        resolve_date_math("2024-01-01||+7x", "gte")
    assert not is_date_math("2024-01-01")       # plain date: untouched
    assert not is_date_math(5)


def test_date_math_now_with_injected_plan_clock():
    from datetime import datetime as DT

    from parquet_generator_spark.operators.esdsl import (
        is_date_math,
        plan_clock,
        resolve_date_math,
    )

    with plan_clock("2024-01-22 09:30:00"):
        assert is_date_math("now")
        assert is_date_math("now-14d/d")
        # same grammar as the post-|| expression, anchored at `now`
        assert resolve_date_math("now", "lt") == DT(2024, 1, 22, 9, 30)
        assert resolve_date_math("now-14d/d", "gte") == DT(2024, 1, 8)
        assert (resolve_date_math("now-1d/d", "lte")
                == DT(2024, 1, 21, 23, 59, 59, 999999))
        assert resolve_date_math("now+2h", "gte") == \
            DT(2024, 1, 22, 11, 30)
        # nesting shadows, exit restores
        with plan_clock(DT(2020, 6, 1)):
            assert resolve_date_math("now/d", "gte") == DT(2020, 6, 1)
        assert resolve_date_math("now/d", "gte") == DT(2024, 1, 22)
        # a plain word starting with 'now' is still not date math
        assert not is_date_math("nowhere")
    # the clock does not leak out of the context
    with pytest.raises(ValueError, match="now-anchored"):
        is_date_math("now")


def test_ids_query_requires_field_and_matches(ips):
    got = ips.filter(translate_query(
        {"ids": {"field": "id", "values": [1, 3, 99]}}))
    assert _ids(got) == [1, 3]
    with pytest.raises(ValueError, match="_id metadata"):
        translate_query({"ids": {"values": [1]}})


def test_octets_over_255_never_match(spark):
    # '1.2.3.999' packs to the same int as '1.2.6.231' without the
    # bound check — it must be malformed (null), not another address
    df = spark.createDataFrame(
        [(1, "1.2.3.999"), (2, "1.2.6.231")], "id long, addr string")
    got = df.filter(translate_query(
        {"term": {"addr": "1.2.6.231/32"}}))
    assert _ids(got) == [2]
    out = esdsl.ip_prefix_agg(df, "addr", 24).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        ("1.2.6.0", 1)]


def test_date_math_ignores_now_prefixed_plain_strings(spark):
    from parquet_generator_spark.operators.esdsl import is_date_math

    # a string VALUE starting with the letters 'now' is not date math
    assert not is_date_math("nowhere")
    df = spark.createDataFrame([(1, "nowhere"), (2, "zurich")],
                               "id long, city string")
    got = df.filter(translate_query(
        {"range": {"city": {"gte": "nowhere"}}}))
    assert _ids(got) == [1, 2]


def test_knn_and_rescore_refuse_silently_dropped_sections(spark):
    from parquet_generator_spark.operators.esdsl import search

    df = spark.createDataFrame([(1, [0.1] * 4)],
                               "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="hybrid"):
        search(df, {"query": {"match_all": {}},
                    "knn": {"field": "embedding",
                            "query_vector": [0.1] * 4, "k": 1}})
    ev = spark.createDataFrame([(1, "a", 1.0)],
                               "doc_id long, k string, v double")
    with pytest.raises(ValueError, match="rescore"):
        search(ev, {"query": {"match_all": {}},
                    "rescore": {"window_size": 5, "query": {
                        "rescore_query": {"match_all": {}}}},
                    "aggs": {"m": {"max": {"field": "v"}}}})
