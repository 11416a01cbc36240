"""Property test: the ES-DSL -> Catalyst translator agrees with an
independent Python evaluator of ES bool semantics on randomly
generated nested query trees (must/filter/must_not/should nesting,
term/range/exists leaves, null fields)."""

from __future__ import annotations

import fnmatch

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_generator_spark.operators.esdsl import translate_query

ROWS = [
    {"id": i, "cat": cat, "n": n, "txt": txt}
    for i, (cat, n, txt) in enumerate([
        ("a", 0, "alpha one"), ("a", 3, "beta two"), ("b", 5, "gamma"),
        ("b", None, "alpha beta"), ("c", 7, None), ("c", 10, "delta"),
        (None, 2, "epsilon"), (None, None, "zeta alpha"), ("a", 10, ""),
        ("b", 1, "eta"),
    ])
]

_leaf = st.one_of(
    st.builds(lambda v: {"term": {"cat": v}},
              st.sampled_from(["a", "b", "c", "d"])),
    st.builds(lambda vs: {"terms": {"cat": vs}},
              st.lists(st.sampled_from(["a", "b", "c"]),
                       min_size=1, max_size=3)),
    st.builds(lambda op, v: {"range": {"n": {op: v}}},
              st.sampled_from(["gt", "gte", "lt", "lte"]),
              st.integers(min_value=-1, max_value=11)),
    st.builds(lambda f: {"exists": {"field": f}},
              st.sampled_from(["cat", "n", "txt"])),
    st.builds(lambda p: {"prefix": {"cat": {"value": p}}},
              st.sampled_from(["a", "b", "ab"])),
    st.builds(lambda p: {"wildcard": {"txt": {"value": p}}},
              st.sampled_from(["*alpha*", "?eta", "gamma"])),
    st.just({"match_all": {}}),
)


def _bool_node(children):
    return st.builds(
        lambda must, filt, must_not, should, msm: {"bool": {
            **({"must": must} if must else {}),
            **({"filter": filt} if filt else {}),
            **({"must_not": must_not} if must_not else {}),
            **({"should": should} if should else {}),
            # explicit k-of-m only when should clauses exist
            **({"minimum_should_match": msm}
               if should and msm is not None else {}),
        }},
        st.lists(children, max_size=2), st.lists(children, max_size=2),
        st.lists(children, max_size=2), st.lists(children, max_size=3),
        st.one_of(st.none(), st.integers(min_value=1, max_value=3)))


_query = st.recursive(_leaf, _bool_node, max_leaves=8)


def _eval(q: dict, row: dict) -> bool:
    (kind, body), = q.items()
    if kind == "match_all":
        return True
    if kind == "term":
        f, v = next(iter(body.items()))
        return row[f] is not None and row[f] == v
    if kind == "terms":
        f, vs = next(iter(body.items()))
        return row[f] is not None and row[f] in vs
    if kind == "range":
        f, conds = next(iter(body.items()))
        if row[f] is None:
            return False
        import operator as op
        ops = {"gt": op.gt, "gte": op.ge, "lt": op.lt, "lte": op.le}
        return all(ops[o](row[f], v) for o, v in conds.items())
    if kind == "exists":
        return row[body["field"]] is not None
    if kind == "prefix":
        f, spec = next(iter(body.items()))
        v = spec["value"] if isinstance(spec, dict) else spec
        return row[f] is not None and row[f].startswith(v)
    if kind == "wildcard":
        f, spec = next(iter(body.items()))
        v = spec["value"] if isinstance(spec, dict) else spec
        return row[f] is not None and fnmatch.fnmatchcase(row[f], v)
    if kind == "bool":
        must = body.get("must", [])
        filt = body.get("filter", [])
        must_not = body.get("must_not", [])
        should = body.get("should", [])
        ok = (all(_eval(c, row) for c in must)
              and all(_eval(c, row) for c in filt)
              and not any(_eval(c, row) for c in must_not))
        msm = body.get("minimum_should_match")
        if msm is None:
            msm = 0 if (must or filt) else 1
        if should and msm >= 1:
            if msm > len(should):  # Lucene: unsatisfiable
                return False
            hits = sum(1 for c in should if _eval(c, row))
            ok = ok and hits >= msm
        return ok
    raise AssertionError(kind)


@pytest.fixture(scope="module")
def dsl_df(spark):
    return spark.createDataFrame(
        ROWS, "id long, cat string, n long, txt string").cache()


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=_query)
def test_translator_matches_reference_semantics(dsl_df, q):
    got = {r["id"] for r in dsl_df.filter(translate_query(q)).collect()}
    want = {row["id"] for row in ROWS if _eval(q, row)}
    assert got == want, f"query {q!r}: spark={sorted(got)} ref={sorted(want)}"


# ------------------------------------------------------------------
# connected-components property: Spark min-label propagation ==
# a plain union-find reference on random edge sets
# ------------------------------------------------------------------

edge_sets = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30))
    .filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=40)


def _union_find_clusters(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # cluster id = min node id reachable (matches min-label fixpoint)
    out = {}
    for n in parent:
        root = find(n)
        out.setdefault(root, []).append(n)
    return {n: min(members) for root, members in out.items()
            for n in members}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_sets)
def test_connected_components_matches_union_find(spark, edges):
    from parquet_generator_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long")
    got = {r["id"]: r["cluster"]
           for r in connected_components(pairs).collect()}
    assert got == _union_find_clusters(edges)
