"""parquet_generator_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference ES->Parquet ETL tool
(liujiawinds/parquet-generator) Spark-first: declarative DataFrame
plans, Catalyst-optimized, designed for 100 TB scale, plus the
LLM-training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) such a pipeline needs.
"""

from parquet_generator_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
