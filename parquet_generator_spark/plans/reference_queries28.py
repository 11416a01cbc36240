"""Round-11 tranche eight: the Portuguese snowball analyzer match
(the FIFTH language analyzer) plus the ES|QL SAMPLE / IP-function
tranche.

Reference parity: ES/Lucene's ``portuguese`` analyzer (stop +
snowball-portuguese stemmer filter) applied through the same
plan-time-analysis / codegen-field-side match translation as the
german/french/spanish/italian siblings (operators/analyzers.py);
the reference repo (liujiawinds/parquet-generator, Bootstrap.java)
is an ETL tool whose ES indices declare language analyzers — the
match semantics generalize what those indices get queried WITH.

Scale notes: the stemmer is ONE codegen expression bound once per
document (operators/analyzers._stemmed_match_sql) behind the
prefix-2 guard (sound for portuguese — the nasal prelude
round-trips and cuts keep >= 3 chars), no UDF, no shuffle before
the small groupBy; at 100 TB the documents scan partitions freely
and the match predicate rides the scan filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------ dsl_match_analyzer_pt

# the synthetic corpus has no Portuguese rows, so a deterministic
# doc_id slice gets planted payloads (literal constants shared by
# plan and oracle — the de/fr/es/it posture): inflections the
# english chain provably cannot fold onto the query's dictionary
# forms (comunicações never S-stems to comunicação; pinned in
# tests/test_snowball_pt.py)
_PT_SNIPPETS = [
    "as comunicações entre equipas",
    "os trabalhadores chegaram cedo",
    "comunicações dos trabalhadores portugueses",
]
_PT_QUERY = "comunicação trabalhador"


def _pt_planted_expr() -> str:
    snip = ("CASE CAST(doc_id % 3 AS INT) "
            + " ".join(f"WHEN {i} THEN '{s}'"
                       for i, s in enumerate(_PT_SNIPPETS))
            + " END")
    return (f"CASE WHEN doc_id % 5 = 2 THEN "
            f"concat({snip}, ' ', substr(text, 1, 60)) "
            f"ELSE substr(text, 1, 60) END")


def dsl_match_analyzer_pt(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """``match`` with ``analyzer: "portuguese"`` (snowball
    portuguese, operator AND): the query's dictionary forms
    (comunicação, trabalhador) reach the planted inflections
    (comunicações, trabalhadores) only through the full stemmer —
    nasal prelude (ã->a~), RV/R1/R2 suffix system over the preluded
    spelling (aço~es group), step-3 i-after-c, residual steps, and
    the nasal postlude. The english chain matches zero of the same
    documents (pinned in tests/test_snowball_pt.py)."""
    from pyspark.sql import functions as F

    from parquet_generator_spark.operators.analyzers import (
        analyzed_match,
        get_analyzer,
    )

    docs = load_table(spark, "documents", sf_dir)
    pred = analyzed_match("mixed", _PT_QUERY,
                          get_analyzer("portuguese"), operator="and")
    return (docs
            .withColumn("mixed", F.expr(_pt_planted_expr()))
            .filter(pred)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("doc_count"))
            .orderBy("source"))


def _match_pt_oracle() -> str:
    from parquet_generator_spark.operators.analyzers import (
        analyzed_match_duck_sql,
        get_analyzer,
    )

    pred = analyzed_match_duck_sql(
        "mixed", _PT_QUERY, get_analyzer("portuguese"),
        operator="and")
    return f"""
WITH m AS (SELECT source, {_pt_planted_expr()} AS mixed
           FROM documents)
SELECT source, count(*) AS doc_count
FROM m WHERE {pred}
GROUP BY source ORDER BY source
"""


QUERIES.update({"dsl_match_analyzer_pt": dsl_match_analyzer_pt})
ORACLES.update({"dsl_match_analyzer_pt": _match_pt_oracle()})
