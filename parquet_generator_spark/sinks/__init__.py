from parquet_generator_spark.sinks.parquet_sink import write_partitioned

__all__ = ["write_partitioned"]
