"""Russian snowball stemmer: hand-traced vectors, three-way engine
parity (Python twin == Spark SQL == DuckDB SQL) over cyrillic
input, the commit-then-test gerund/verb semantics, step-2 и
removal, the R2-gated derivational step, the нн/superlative/ь
alternatives, the ё prelude, and the prefix-2 guard invariant."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_generator_spark.operators.snowball_ru import (
    _regions,
    russian_stem,
    russian_stem_sql,
)

# traced through the documented step structure (noun/adjective
# declensions, step-2 и, derivational ость, reflexive + verb,
# commit-then-test failures)
VECTORS = {
    "книга": "книг", "книги": "книг", "книгами": "книг",
    "красивый": "красив", "красивые": "красив",
    "красивая": "красив", "красивых": "красив",
    # ия -> и (noun я) then step-2 и
    "станция": "станц", "станции": "станц",
    # derivational ость in R2
    "важность": "важност", "важности": "важност",
    # reflexive + group-1 verb after а
    "осталось": "оста",
    # gerund committed on вшись but prev е fails -> reflexive+noun
    "увидевшись": "увидевш",
    # gerund вшись after а
    "сделавшись": "сдела",
    # adjectival ая (before the noun try)
    "читая": "чит",
    # ь removal (step 4)
    "мышь": "мыш",
    # ё prelude
    "её": "е",
    # no region -> untouched
    "и": "и", "к": "к", "": "",
}

_ALPHA = "абвгдежзийклмнопрстуфхцчшщъыьэюяё"


def test_reference_vectors():
    for w, want in VECTORS.items():
        got = russian_stem(w)
        assert got == want, (w, got, want)


def test_rv_after_first_vowel_r2_standard():
    rv, r2 = _regions("книга")
    assert rv == 4          # after и
    rv, r2 = _regions("осталось")
    assert rv == 2 and r2 == 6
    rv, r2 = _regions("кркр")
    assert rv == 5 and r2 == 5  # no vowel: both empty


def test_commit_then_test_gerund():
    # longest textual match is group-2 ывшись -> unconditional
    assert russian_stem("забывшись") == "заб"
    # committed group-1 вши with prev е -> the gerund try fails and
    # the word falls through to the noun и
    assert russian_stem("певши") == "певш"


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _duck_stems(con, words):
    sql = russian_stem_sql("w", "duck")
    con.execute("CREATE OR REPLACE TABLE tw(w VARCHAR)")
    con.executemany("INSERT INTO tw VALUES (?)",
                    [(w,) for w in words])
    return dict(con.execute(f"SELECT w, {sql} FROM tw").fetchall())


def test_duckdb_matches_python_on_vectors(duck):
    got = _duck_stems(duck, list(VECTORS))
    for w in VECTORS:
        assert got[w] == russian_stem(w), w


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet=_ALPHA, min_size=0, max_size=12),
                min_size=1, max_size=15))
def test_duckdb_matches_python_random(ws):
    con = duckdb.connect()
    got = _duck_stems(con, list(set(ws)))
    for w in set(ws):
        assert got[w] == russian_stem(w), w


def test_spark_matches_python(spark):
    from pyspark.sql import functions as F

    words = list(VECTORS) + [
        "женщинами", "быстрее", "новейший", "деревья", "читающий",
        "написанный", "говорить", "говорили", "последний",
        "возможностями", "ёжик", "объявление", "яяя", "ннн",
        "большинство", "культурный"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    sql = russian_stem_sql("w", "spark")
    got = {r["w"]: r["s"] for r in
           df.select("w", F.expr(sql).alias("s")).collect()}
    for w in words:
        assert got[w] == russian_stem(w), w


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_ALPHA, min_size=0, max_size=12))
def test_prefix2_invariant(w):
    """The analyzers prefix-2 guard soundness for russian: edits
    are tail deletions only; the ё->е prelude is folded into the
    compared prefix — a >= 2-char stem keeps the token's first two
    FOLDED chars."""
    s = russian_stem(w)
    folded = w.replace("ё", "е")
    if len(s) >= 2 and len(folded) >= 2:
        assert s[:2] == folded[:2], (w, s)


def test_russian_analyzer_matches_declensions(spark):
    from pyspark.sql import functions as F

    from parquet_generator_spark.operators.analyzers import (
        analyzed_match,
        get_analyzer,
    )
    from parquet_generator_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    planted = ("CASE CAST(doc_id % 2 AS INT) "
               "WHEN 0 THEN 'красивые книги на столе' "
               "ELSE 'книгами и красивая полка' END")
    docs = load_table(spark, "documents", sf).withColumn(
        "mixed", F.expr(planted))
    ru = get_analyzer("russian")
    own = analyzed_match("mixed", "книга красивый", ru,
                         operator="and")
    assert docs.filter(own).count() == docs.count()
    # wrong dictionary forms match nothing
    miss = analyzed_match("mixed", "собака зелёный", ru,
                          operator="and")
    assert docs.filter(miss).count() == 0
