"""Additional source/sink formats beyond parquet + JSON: CSV and ORC.

The reference tool only emitted parquet (EsParquetWriter.java); an
engine replacing it also needs to ingest the flat files that turn up
around an ES export pipeline. Schemas are always passed explicitly on
read: at 100 TB, inferSchema means a full extra pass over the data —
infer once on a sample (schema.infer) and pin the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_csv(df: DataFrame, path: str, **options) -> None:
    (df.write.mode("overwrite")
     .options(header=True, **options)
     .csv(path))


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             **options) -> DataFrame:
    """Explicit-schema CSV read (no inferSchema pass)."""
    return (spark.read.schema(schema)
            .options(header=True, **options)
            .csv(path))


def write_orc(df: DataFrame, path: str, **options) -> None:
    df.write.mode("overwrite").options(**options).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scans support the same pushdown/pruning surface as parquet
    (predicate pushdown via ORC indexes, column projection)."""
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str, *,
                compression: str | None = "gzip", **options) -> None:
    """JSON-Lines export — the interchange format most LLM training
    stacks consume. One JSON object per line, gzip by default
    (splittable formats beat gzip for RE-reading at scale; jsonl.gz
    is the convention for handing data OFF to tokenizer/training
    jobs that stream shards start-to-finish). Column types map per
    Spark's JSON writer: timestamps ISO-8601, binary base64."""
    w = df.write.mode("overwrite").options(**options)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType,
               **options) -> DataFrame:
    """Explicit-schema JSONL read: no schema-inference pass (at
    100 TB that is a full extra read), malformed lines land as nulls
    under PERMISSIVE mode rather than failing the job — the same
    lenient contract as the ES decode path."""
    return (spark.read.schema(schema)
            .options(mode="PERMISSIVE", **options)
            .json(path))
