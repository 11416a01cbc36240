"""Property tests: span_not and the multi-clause proximity predicate
agree with brute-force Python evaluators over random token texts —
the position arithmetic has off-by-one hazards a fixed fixture can
miss (1-based vs 0-based positions, zone boundaries, repeated
terms)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_generator_spark.operators.esdsl import (
    span_not_pred_sql,
    translate_query,
)

_VOCAB = ["spark", "slow", "fast", "window", "merge"]

_texts = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8) \
    .map(" ".join)


def _brute_span_not(text: str, inc: str, exc: str,
                    pre: int, post: int) -> bool:
    toks = text.split(" ")
    pis = [i for i, t in enumerate(toks) if t == inc]
    pes = [i for i, t in enumerate(toks) if t == exc]
    return any(all(not (p - pre <= q <= p + post) for q in pes)
               for p in pis)


class TestSpanNotProperty:
    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(texts=st.lists(_texts, min_size=1, max_size=8),
           pre=st.integers(min_value=0, max_value=3),
           post=st.integers(min_value=0, max_value=3))
    def test_matches_brute_force_duck(self, texts, pre, post):
        """The DuckDB flavor (used by every oracle) agrees with the
        brute-force evaluator; cross-engine parity of the two
        flavors is already pinned by the oracle-gate tests."""
        con = duckdb.connect()
        pred = span_not_pred_sql("text", "spark", "slow", pre, post,
                                 engine="duck")
        vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        got = {r[0] for r in con.execute(
            f"SELECT id FROM (VALUES {vals}) AS t(id, text) "
            f"WHERE {pred}").fetchall()}
        want = {i for i, t in enumerate(texts)
                if _brute_span_not(t, "spark", "slow", pre, post)}
        assert got == want

    def test_spark_flavor_agrees_on_edge_texts(self, spark):
        """Spark flavor on the exact boundary shapes: include at
        text start/end, exclude exactly pre/post away, repeated
        include terms."""
        texts = [
            "spark", "slow spark", "spark slow", "spark fast slow",
            "slow fast spark", "spark spark slow", "slow spark spark",
            "spark", "slow slow spark slow slow",
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "id long, text string")
        for pre, post in [(0, 0), (1, 1), (2, 0), (0, 2)]:
            q = {"span_not": {
                "include": {"span_term": {"text": "spark"}},
                "exclude": {"span_term": {"text": "slow"}},
                "pre": pre, "post": post}}
            got = {r["id"] for r in
                   df.filter(translate_query(q)).collect()}
            want = {i for i, t in enumerate(texts)
                    if _brute_span_not(t, "spark", "slow", pre, post)}
            assert got == want, (pre, post)
