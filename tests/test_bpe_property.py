"""Property pins for the BPE training kernel's novel cross-engine
trick: DOUBLE-pass leftmost non-overlapping string replace over a
space-delimited symbol string equals greedy left-to-right pair
merging (the semantics both engines must share for bpe_vocab_train /
bpe_encode_stats to stay oracle-exact). Hypothesis drives adversarial
symbol streams (runs, overlaps, near-miss prefixes); DuckDB executes
the same replace to pin the third engine."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_generator_spark.operators.analyzers import s_stem

SYMS = ["a", "b", "c", "ab", "ba", "aa"]


def greedy_merge(tokens: list[str], left: str, right: str) -> list[str]:
    """Reference greedy left-to-right BPE merge."""
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if (i + 1 < len(tokens)
                and tokens[i] == left and tokens[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def double_replace(tokens: list[str], left: str, right: str) -> list[str]:
    s = " " + " ".join(tokens) + " "
    pat, rep = f" {left} {right} ", f" {left}{right} "
    s = s.replace(pat, rep).replace(pat, rep)
    return s.split()


@settings(max_examples=300, deadline=None)
@given(st.lists(st.sampled_from(SYMS), min_size=0, max_size=14),
       st.sampled_from(SYMS), st.sampled_from(SYMS))
def test_double_replace_equals_greedy_merge(tokens, left, right):
    assert double_replace(tokens, left, right) == \
        greedy_merge(tokens, left, right)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.sampled_from(SYMS), min_size=0, max_size=10),
       st.sampled_from(SYMS), st.sampled_from(SYMS))
def test_duckdb_replace_matches_python_replace(tokens, left, right):
    """DuckDB's replace() must share Python's leftmost
    non-overlapping semantics (the oracle runs there)."""
    s = " " + " ".join(tokens) + " "
    pat, rep = f" {left} {right} ", f" {left}{right} "
    py = s.replace(pat, rep).replace(pat, rep)
    dk = duckdb.sql(
        "SELECT replace(replace(?, ?, ?), ?, ?)",
        params=[s, pat, rep, pat, rep]).fetchone()[0]
    assert dk == py


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghilmnoprstuy", min_size=0, max_size=12))
def test_s_stem_python_duckdb_parity(word):
    """Random lowercase words: the Python plan-time stemmer and the
    SQL generator's DuckDB rendering agree (the Spark rendering is
    pinned batch-wise in test_analyzers.py)."""
    from parquet_generator_spark.operators.analyzers import s_stem_sql

    dk = duckdb.sql(
        f"SELECT {s_stem_sql('w')} FROM (SELECT ? AS w)",
        params=[word]).fetchone()[0]
    assert dk == s_stem(word)
