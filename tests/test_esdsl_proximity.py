"""`intervals` / multi-clause `span_near` proximity semantics,
pinned against hand-derived expectations on tiny frames. The key
contract under test: max_gaps / slop is a SHARED budget across all
gaps (Lucene), not a per-gap bound — the crafted rows below separate
the two readings."""

from __future__ import annotations

import pytest

from parquet_generator_spark.operators import esdsl

# a=pos1 b c d markers; gaps counted in intervening tokens
DOCS = [
    # a .. b .. c with gaps (1, 1): total 2
    (1, "a x b y c"),
    # a .. b .. c with gaps (2, 2): total 4 — per-gap<=2 would pass
    # a shared budget of 2, the exact shared reading must NOT
    (2, "a x x b y y c"),
    # out of order
    (3, "c b a"),
    # adjacent, ordered
    (4, "a b c"),
    # repeated term: only one 'a' position — 'a a' needs two distinct
    (5, "z a z"),
    # two 'a's, adjacent
    (6, "a a z"),
    (7, "nothing relevant here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "id long, text string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _iv(docs, query, max_gaps, ordered):
    return docs.filter(esdsl.translate_query({"intervals": {"text": {
        "match": {"query": query, "max_gaps": max_gaps,
                  "ordered": ordered}}}}))


def test_intervals_shared_budget_is_exact(docs):
    # shared budget 2: row 1 (1+1) yes, row 2 (2+2) NO even though
    # each individual gap is <= 2
    assert _ids(_iv(docs, "a b c", 2, True)) == [1, 4]
    # budget 4 admits row 2
    assert _ids(_iv(docs, "a b c", 4, True)) == [1, 2, 4]


def test_intervals_ordered_vs_unordered(docs):
    assert _ids(_iv(docs, "a b c", 0, True)) == [4]
    # unordered window of width 3 also catches the reversed row
    assert _ids(_iv(docs, "a b c", 0, False)) == [3, 4]


def test_intervals_unlimited_gaps(docs):
    # max_gaps -1 = unlimited: ordered still requires order
    assert _ids(_iv(docs, "a b c", -1, True)) == [1, 2, 4]
    assert _ids(_iv(docs, "a b c", -1, False)) == [1, 2, 3, 4]


def test_intervals_repeated_term_needs_distinct_positions(docs):
    # 'a a': two DISTINCT positions of 'a' required
    assert _ids(_iv(docs, "a a", 0, False)) == [6]


def test_intervals_any_of_and_all_of(docs):
    got = docs.filter(esdsl.translate_query({"intervals": {"text": {
        "any_of": {"intervals": [
            {"match": {"query": "a b c", "max_gaps": 0,
                       "ordered": True}},
            {"match": {"query": "nothing here", "max_gaps": 1,
                       "ordered": True}},
        ]}}}}))
    assert _ids(got) == [4, 7]
    with pytest.raises(ValueError, match="all_of"):
        esdsl.translate_query({"intervals": {"text": {
            "all_of": {"intervals": []}}}})


def test_span_near_three_clauses(docs):
    def near(slop, in_order):
        return docs.filter(esdsl.translate_query({"span_near": {
            "clauses": [{"span_term": {"text": t}}
                        for t in ("a", "b", "c")],
            "slop": slop, "in_order": in_order}}))
    assert _ids(near(2, True)) == [1, 4]
    assert _ids(near(0, False)) == [3, 4]


def test_span_near_two_clause_regex_path_agrees(docs):
    # the 2-clause regex fast path and the position chain must agree
    for slop in (0, 1, 2):
        regex = docs.filter(esdsl.translate_query({"span_near": {
            "clauses": [{"span_term": {"text": "a"}},
                        {"span_term": {"text": "c"}}],
            "slop": slop, "in_order": True}}))
        chain = docs.filter(esdsl.F.expr(esdsl.proximity_pred_sql(
            "text", ["a", "c"], slop, True)))
        assert _ids(regex) == _ids(chain), f"slop={slop}"


def test_proximity_duck_oracle_agrees(spark, docs):
    import duckdb

    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    for terms, gaps, ordered in (
        (["a", "b", "c"], 2, True),
        (["a", "b", "c"], 0, False),
        (["a", "a"], 0, False),
    ):
        s = _ids(docs.filter(esdsl.F.expr(
            esdsl.proximity_pred_sql("text", terms, gaps, ordered))))
        pred = esdsl.proximity_pred_sql("text", terms, gaps, ordered,
                                        engine="duck")
        d = sorted(r[0] for r in con.execute(
            f"SELECT id FROM docs WHERE {pred}").fetchall())
        assert s == d, (terms, gaps, ordered)


# ---------------------------------------------------------------- rescore

RES_DOCS = [
    (1, "spark window agg"),      # phase1 hit + phrase hit
    (2, "spark agg"),             # phase1 hit, no phrase
    (3, "window spark"),          # phase1 hit, no phrase (order)
    (4, "nothing"),               # no match
]


def test_rescore_total_and_window(spark):
    docs = spark.createDataFrame(RES_DOCS, "doc_id long, text string")
    body = {
        "query": {"match": {"text": {"query": "spark", "boost": 2.0}}},
        "rescore": {"window_size": 2, "query": {
            "rescore_query": {"match_phrase": {
                "text": {"query": "spark window", "boost": 3.0}}},
            "query_weight": 0.5, "rescore_query_weight": 2.0,
            "score_mode": "total"}},
        "size": 2,
    }
    got = [(r["rank"], r["doc_id"], r["score"])
           for r in esdsl.search(docs, body).collect()]
    # phase1: docs 1,2,3 all score 2.0; window of 2 keeps ids 1,2.
    # doc 1 rescores 0.5*2 + 2*3 = 7.0; doc 2 -> 1.0. doc 3 is OUTSIDE
    # the window, so its phrase miss never gets re-ranked in.
    assert got == [(1, 1, 7.0), (2, 2, 1.0)]


def test_rescore_modes_and_guards(spark):
    docs = spark.createDataFrame(RES_DOCS, "doc_id long, text string")

    def run(mode):
        body = {
            "query": {"match": {"text": {"query": "spark",
                                         "boost": 2.0}}},
            "rescore": {"window_size": 3, "query": {
                "rescore_query": {"match_phrase": {
                    "text": {"query": "spark window", "boost": 3.0}}},
                "score_mode": mode}},
            "size": 1,
        }
        return esdsl.search(docs, body).collect()[0]["score"]

    assert run("total") == 5.0      # 2 + 3
    assert run("multiply") == 6.0   # 2 * 3
    assert run("avg") == 2.5
    assert run("max") == 3.0
    assert run("min") == 2.0        # doc1 min(2,3); others min(2,0)=0
    import pytest as _pt
    with _pt.raises(ValueError, match="score_mode"):
        run("geometric")
    with _pt.raises(ValueError, match="window_size"):
        esdsl.rescore_search(docs, {
            "query": {"match": {"text": "spark"}},
            "rescore": {"window_size": 1,
                        "query": {"rescore_query": {
                            "match": {"text": "agg"}}}},
            "size": 5})
