from parquet_generator_spark.plans import analytics

__all__ = ["analytics"]
