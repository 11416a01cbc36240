"""Stream-static enrichment join: a streaming fact joined to a static
(or slowly-refreshed) dimension — the reference's per-doc field
lookups generalized to the streaming path.

The dim side is broadcast per micro-batch, so the stream never
shuffles: state stays bounded, and the same builder runs identically
on a batch DataFrame (oracle-checked) and a readStream source
(test-checked), the repo's standard batch/stream parity shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_events_with_customer(events: DataFrame,
                                customer: DataFrame) -> DataFrame:
    """Join events to the customer dim (user_id = c_custkey) and
    aggregate purchase traffic per market segment."""
    dim = customer.select(F.col("c_custkey").alias("user_id"),
                          "c_mktsegment")
    return (events.filter(F.col("event_type") == "purchase")
            .join(F.broadcast(dim), "user_id")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


ENRICH_ORACLE = """
SELECT c_mktsegment, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
WHERE event_type = 'purchase'
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""
