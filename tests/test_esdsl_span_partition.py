"""span_or / span_not position semantics and terms-agg partitioning,
pinned on tiny hand-checked frames."""

from __future__ import annotations

import pytest

from parquet_generator_spark.operators.esdsl import (
    search,
    translate_query,
)

DOCS = [
    (1, "slow spark window"),       # 'slow' 1 before 'spark'
    (2, "spark slow window"),       # 'slow' 1 after 'spark'
    (3, "spark window slow"),       # 'slow' 2 after -> clean
    (4, "slow spark fast spark"),   # 2nd 'spark' occurrence clean
    (5, "merge batch"),             # no 'spark'
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "id long, text string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


class TestSpanNot:
    def test_exclusion_zone(self, docs):
        q = {"span_not": {
            "include": {"span_term": {"text": "spark"}},
            "exclude": {"span_term": {"text": "slow"}},
            "pre": 1, "post": 1}}
        # doc 1: slow immediately before -> excluded occurrence only
        # doc 2: slow immediately after -> excluded
        # doc 3: slow 2 tokens after -> clean occurrence
        # doc 4: second 'spark' has no adjacent 'slow' -> matches
        assert _ids(docs.filter(translate_query(q))) == [3, 4]

    def test_zero_dist_is_plain_presence(self, docs):
        q = {"span_not": {
            "include": {"span_term": {"text": "spark"}},
            "exclude": {"span_term": {"text": "slow"}},
            "pre": 0, "post": 0}}
        # a zone of just the include position itself never contains
        # the (distinct) exclude term -> any doc with 'spark'
        assert _ids(docs.filter(translate_query(q))) == [1, 2, 3, 4]

    def test_mixed_fields_raise(self):
        with pytest.raises(ValueError):
            translate_query({"span_not": {
                "include": {"span_term": {"text": "a"}},
                "exclude": {"span_term": {"other": "b"}}}})


class TestSpanOr:
    def test_union(self, docs):
        q = {"span_or": {"clauses": [
            {"span_term": {"text": "merge"}},
            {"span_term": {"text": "window"}}]}}
        assert _ids(docs.filter(translate_query(q))) == [1, 2, 3, 5]


class TestTermsPartition:
    def test_pages_cover_key_space_once(self, spark):
        df = spark.createDataFrame(
            [(i % 37, "x") for i in range(500)], "k long, pad string")
        pages = []
        np_ = 4
        for p in range(np_):
            body = {"aggs": {"t": {"terms": {
                "field": "k", "size": 100,
                "include": {"partition": p,
                            "num_partitions": np_}}}}}
            pages.append({r["key"]: r["doc_count"]
                          for r in search(df, body).collect()})
        seen = {}
        for page in pages:
            for k, c in page.items():
                assert k not in seen  # pages are disjoint
                seen[k] = c
        assert len(seen) == 37  # ... and exhaustive
        assert sum(seen.values()) == 500

    def test_partition_out_of_range(self, spark):
        df = spark.createDataFrame([(1, "x")], "k long, pad string")
        with pytest.raises(ValueError):
            search(df, {"aggs": {"t": {"terms": {
                "field": "k",
                "include": {"partition": 4,
                            "num_partitions": 4}}}}}).collect()
