"""ES ``_bulk`` NDJSON export — the REVERSE of the reference's path.

The reference pulls documents out of Elasticsearch (scroll search,
EsParquetWriter.java:14-21,64) and writes parquet; a user migrating
back (re-index after a mapping change, seeding a test cluster,
shipping curated training slices to a search team) needs the other
direction: parquet rows rendered as the ``_bulk`` API's
action/source line pairs:

    {"index": {"_index": "<index>", "_id": "<id>"}}
    {<source document>}

Spark-first shape: both lines render JVM-side (``to_json`` over a
struct; timestamps in ISO-8601, ES's default date format) and concat
into ONE text row per document — no Python in the loop, no shuffle
beyond the optional size-capped repartition that bounds the line
count per output file (real clusters cap bulk request sizes, so the
file IS the request unit).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_bulk_lines(df: DataFrame, index: str,
                  id_col: str) -> DataFrame:
    """Render each row as its two-line ``_bulk`` stanza (one string
    column ``value``; the embedded newline separates action from
    source, and the text writer's trailing newline terminates the
    stanza — exactly the framing the _bulk endpoint parses)."""
    # to_json over a nested struct (NOT string concat) so an id or
    # index name containing quotes/backslashes is JSON-escaped and
    # the action line is always valid NDJSON (ADVICE r8).
    action = F.to_json(F.struct(
        F.struct(
            F.lit(index).alias("_index"),
            F.col(id_col).cast("string").alias("_id"),
        ).alias("index")))
    source_cols = [c for c in df.columns]
    source = F.to_json(F.struct(*source_cols),
                       {"timestampFormat":
                        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"})
    return df.select(
        F.concat(action, F.lit("\n"), source).alias("value"))


def write_bulk_export(df: DataFrame, path: str, index: str,
                      id_col: str, docs_per_file: int = 5000) -> int:
    """Write the corpus as ``_bulk`` request files: each output file
    carries at most ``docs_per_file`` stanzas (clusters reject
    oversized bulk bodies, so the request unit must be bounded at
    write time, not by a post-split). Returns the planned request-
    unit count (= minimum file count). The repartition is round-robin
    on a COUNT-derived width — no key, no skew; at 100 TB the count
    comes from scan statistics and the write parallelism equals the
    file count. Round-robin balances per INPUT partition from an
    arbitrary start offset, so a partition can land up to
    (#input partitions - 1) rows over the target — the writer's
    ``maxRecordsPerFile`` makes the per-file cap HARD by rolling any
    overflow into an extra file (ADVICE r8)."""
    n = df.count()
    n_files = max(1, math.ceil(n / docs_per_file))
    (to_bulk_lines(df, index, id_col)
     .repartition(n_files)
     .write.mode("overwrite")
     .option("maxRecordsPerFile", docs_per_file)
     .text(path))
    return n_files
