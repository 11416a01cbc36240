"""Property pins for the BPE training kernel's cross-engine trick:
DOUBLE-pass leftmost non-overlapping string replace over a
space-delimited symbol string.  The load-bearing property is
CROSS-ENGINE PARITY of the implemented semantics (Python replace ==
Spark replace == DuckDB replace) — that is what keeps
bpe_vocab_train / bpe_encode_stats oracle-exact.

The double replace additionally EQUALS greedy left-to-right pair
merging whenever left != right.  For SELF-OVERLAPPING pairs
(left == right) on symbol runs >= 5 it deviates from Sennrich-greedy
BPE: ['a']*5 with merge (a,a) gives ['aa','a','aa'] via double
replace vs greedy ['aa','aa','a'], and runs >= 6 differ in token
count (4 vs 3).  That deviation is identical in all three engines
(parity holds); it is pinned below as an expected-divergence
regression, not hidden."""

from __future__ import annotations

import duckdb
from hypothesis import assume, given, settings
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
def test_double_replace_equals_greedy_merge_distinct_pair(
        tokens, left, right):
    """Greedy equivalence holds for left != right (non-self-
    overlapping patterns): pass one takes every other match of an
    adjacent chain, pass two takes the rest, and the merged token
    can never seed a new occurrence of the fixed pattern."""
    assume(left != right)
    assert double_replace(tokens, left, right) == \
        greedy_merge(tokens, left, right)


def test_double_replace_self_pair_divergence_pinned():
    """EXPECTED DIVERGENCE (not a bug to 'fix' silently): for
    left == right the double replace deviates from greedy BPE on
    runs >= 5 — a replaced occurrence consumes the shared boundary
    space, so the scan skips the middle of an odd run and the second
    pass finds nothing new.  All three engines implement the SAME
    double-replace semantics, so oracle parity is unaffected; this
    test pins the deviation so it stays documented."""
    # run of 5: same token count, different grouping
    assert double_replace(["a"] * 5, "a", "a") == ["aa", "a", "aa"]
    assert greedy_merge(["a"] * 5, "a", "a") == ["aa", "aa", "a"]
    # run of 6: token counts differ (4 vs 3)
    assert double_replace(["a"] * 6, "a", "a") == \
        ["aa", "a", "aa", "a"]
    assert greedy_merge(["a"] * 6, "a", "a") == ["aa", "aa", "aa"]
    # runs <= 4 agree even for self-pairs
    for n in range(5):
        assert double_replace(["a"] * n, "a", "a") == \
            greedy_merge(["a"] * n, "a", "a")
    # and DuckDB shares the divergent double-replace output exactly
    s = " " + " ".join(["a"] * 6) + " "
    dk = duckdb.sql(
        "SELECT replace(replace(?, ' a a ', ' aa '), ' a a ', ' aa ')",
        params=[s]).fetchone()[0]
    assert dk.split() == ["aa", "a", "aa", "a"]


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
