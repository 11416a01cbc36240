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
