"""Round-11 tranche eight (curation): the C4 cleaning heuristics
(Raffel et al. 2020, "Exploring the Limits of Transfer Learning" —
the published line/page filter stack behind the C4 corpus) over the
documents table.

Scale notes: the whole filter stack is per-document codegen over
one documents scan — split + higher-order filter + a handful of
contains() probes, no UDF, no join; the only shuffle is the bounded
per-source rollup, so the operator is a pure map at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------------ c4_line_filters

# the synthetic corpus is one line of clean tokens, so a
# deterministic multi-line "page" is planted per doc (literal
# constants shared by plan and oracle — the analyzer-query posture):
# doc_id slices inject each C4 failure mode
_C4_PAGE_EXPR = """
concat_ws(chr(10),
  substr(text, 1, 60) || ' tail sentence one.',
  'and the second sentence keeps going.',
  'a third sentence for the page.',
  'fourth sentence of the page here.',
  CASE WHEN doc_id % 4 = 0
       THEN 'fifth good sentence present.'
       ELSE 'too short' END,
  CASE WHEN doc_id % 5 = 1
       THEN 'please enable javascript to continue.'
       ELSE 'another fine sentence appears.' END,
  CASE WHEN doc_id % 11 = 3
       THEN 'lorem ipsum dolor sit amet.'
       ELSE 'closing sentence of the page.' END,
  CASE WHEN doc_id % 13 = 5
       THEN 'var f = function() { return 1; }'
       ELSE 'really the last sentence.' END)
"""

# C4 line rules (kept iff ALL hold): terminal punctuation, >= 3
# words, no "javascript". Page rules: no "lorem ipsum", no curly
# brace, and >= 5 retained sentences (line-granular here: the
# kept-LINE count stands in for the sentence count — documented
# approximation; the planted pages are one sentence per line).
_C4_MIN_WORDS = 3
_C4_MIN_SENTENCES = 5

_LINE_KEEP_SPARK = (
    "l -> right(l, 1) IN ('.', '!', '?', '\"') "
    f"AND size(filter(split(l, ' '), w -> w != '')) "
    f">= {_C4_MIN_WORDS} "
    "AND NOT contains(lower(l), 'javascript')")
_LINE_KEEP_DUCK = (
    "l -> right(l, 1) IN ('.', '!', '?', '\"') "
    f"AND len(list_filter(string_split(l, ' '), w -> w != '')) "
    f">= {_C4_MIN_WORDS} "
    "AND NOT contains(lower(l), 'javascript')")


def c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning (Raffel et al. 2020 §2.2) as one codegen pass:
    line filter (terminal punctuation + >= 3 words + no
    "javascript"), then page filter (no "lorem ipsum", no curly
    brace, >= 5 retained sentences). Reports the per-source funnel
    a curation run reads before committing the config."""
    docs = load_table(spark, "documents", sf_dir)
    staged = docs.select(
        "source",
        F.expr(_C4_PAGE_EXPR).alias("page"))
    lines = F.expr("split(page, '\\n')")
    kept = F.expr(f"filter(split(page, '\\n'), {_LINE_KEEP_SPARK})")
    per_doc = staged.select(
        "source",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        (~F.expr("contains(lower(page), 'lorem ipsum')")
         & ~F.expr("contains(page, '{')")).alias("clean_page"))
    page_keep = (F.col("clean_page")
                 & (F.col("n_kept") >= _C4_MIN_SENTENCES))
    return (per_doc
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("pages"),
                 F.sum(page_keep.cast("long")).alias("pages_kept"),
                 F.sum("n_lines").cast("long").alias("lines"),
                 F.sum(F.when(page_keep, F.col("n_kept"))
                       .otherwise(F.lit(0)))
                 .cast("long").alias("lines_kept"))
            .select("source", "pages", "pages_kept", "lines",
                    "lines_kept",
                    F.round(F.col("pages_kept").cast("double")
                            / F.col("pages"), 4).alias("keep_rate"))
            .orderBy("source"))


C4_LINE_FILTERS_ORACLE = f"""
WITH staged AS (
  SELECT source, {_C4_PAGE_EXPR} AS page FROM documents),
per_doc AS (
  SELECT source,
         len(string_split(page, chr(10))) AS n_lines,
         len(list_filter(string_split(page, chr(10)),
                         {_LINE_KEEP_DUCK})) AS n_kept,
         (NOT contains(lower(page), 'lorem ipsum')
          AND NOT contains(page, '{{')) AS clean_page
  FROM staged),
flagged AS (
  SELECT source, n_lines, n_kept,
         (clean_page AND n_kept >= {_C4_MIN_SENTENCES}) AS keep
  FROM per_doc)
SELECT source,
       count(*) AS pages,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         AS pages_kept,
       CAST(sum(n_lines) AS BIGINT) AS lines,
       CAST(sum(CASE WHEN keep THEN n_kept ELSE 0 END) AS BIGINT)
         AS lines_kept,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS keep_rate
FROM flagged GROUP BY source ORDER BY source
"""


QUERIES.update({"c4_line_filters": c4_line_filters})
ORACLES.update({"c4_line_filters": C4_LINE_FILTERS_ORACLE})
