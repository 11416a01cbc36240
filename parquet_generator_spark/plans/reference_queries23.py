"""ES-DSL twenty-third tranche: TSDS counter semantics.

``dsl_counter_rate`` — ES 8.7+ time-series (TSDS) ``rate`` over a
field mapped ``time_series_metric: counter``: a counter only climbs;
a drop means the emitting process RESET, and the aggregation must
reconstruct the true increase per bucket as

    increase = delta             if delta >= 0
             = current value     if delta <  0   (reset: climbed from 0)

(the Prometheus/ES counter-rate rule). The plain ``rate`` agg
(reference_queries16.dsl_rate) treats values as deltas; this is the
stateful sibling every observability pipeline actually needs.

Spark-first shape: one window (lag over the series key, ordered by
event time with an id tie-break), a CASE for the reset rule, one
grouped pass per day bucket — no self-join, no driver state. The
synthetic counter wraps modulo 1000 (cumulative per-user sum of a
deterministic per-event weight), so resets occur organically and
identically in both engines.

Scale: the window partitions by user_id (series cardinality — the
TSDS routing key), so state is per-series and the shuffle is the
same one a TSDS index already does on _tsid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}

_CTR_MOD = 1000


def dsl_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day counter rate with reset reconstruction: events,
    n_resets, total_increase, and increase per hour (rounded)."""
    ev = load_table(spark, "events", sf_dir)
    w_cum = (Window.partitionBy("user_id")
             .orderBy("ts", "event_id")
             .rowsBetween(Window.unboundedPreceding, 0))
    ctr = ev.select(
        "user_id", "ts", "event_id",
        (F.sum(F.col("event_id") % 5 + 1).over(w_cum) % _CTR_MOD)
        .alias("ctr"))
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ctr.select(
        "ts", "ctr",
        (F.col("ctr") - F.lag("ctr").over(w_lag)).alias("delta"))
    inc = d.select(
        F.to_date("ts").alias("day"),
        F.when(F.col("delta").isNull(), F.lit(0).cast("long"))
        .when(F.col("delta") >= 0, F.col("delta"))
        .otherwise(F.col("ctr")).alias("inc"),
        (F.col("delta") < 0).cast("int").alias("is_reset"))
    return (inc.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("is_reset").alias("n_resets"),
                 F.sum("inc").alias("total_increase"),
                 F.round(F.sum("inc") / 24.0, 4)
                 .alias("increase_per_hour"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_events", "n_resets", "total_increase",
                    "increase_per_hour")
            .orderBy("day"))


DSL_COUNTER_RATE_ORACLE = f"""
WITH ctr AS (
  SELECT user_id, ts, event_id,
         sum(event_id % 5 + 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) % {_CTR_MOD} AS ctr
  FROM events),
d AS (
  SELECT ts, ctr,
         ctr - lag(ctr) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS delta
  FROM ctr),
inc AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN delta IS NULL THEN 0
              WHEN delta >= 0 THEN delta
              ELSE ctr END AS inc,
         CASE WHEN delta < 0 THEN 1 ELSE 0 END AS is_reset
  FROM d)
SELECT strftime(day, '%Y-%m-%d') AS day,
       count(*) AS n_events,
       CAST(sum(is_reset) AS BIGINT) AS n_resets,
       CAST(sum(inc) AS BIGINT) AS total_increase,
       round(sum(inc) / 24.0, 4) AS increase_per_hour
FROM inc
GROUP BY day
ORDER BY day
"""

QUERIES.update({"dsl_counter_rate": dsl_counter_rate})
ORACLES.update({"dsl_counter_rate": DSL_COUNTER_RATE_ORACLE})


# ------------------------------------------------------ dsl_tsds_downsample

def dsl_tsds_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8.5+ TSDS DOWNSAMPLING: roll the raw series up to 6h
    buckets keeping, per (series, bucket), the gauge's last value
    (by event time, id tie-break) plus min/max/sum/count — exactly
    the stats a downsampled TSDS index persists per dimension tuple.
    One window for the last-value pick + one grouped pass, both
    keyed on (series, bucket): the same shuffle key the TSDS index
    already routes on, so at 100 TB this is a co-partitioned rollup.
    Output is bucketed per event_type series (user-level rollups
    would be row-explosive in a report)."""
    ev = load_table(spark, "events", sf_dir)
    bucketed = ev.select(
        "event_type", "value", "ts", "event_id",
        F.date_format(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") / 21600).cast("long") * 21600),
            "yyyy-MM-dd HH:mm:ss").alias("bucket"))
    w = (Window.partitionBy("event_type", "bucket")
         .orderBy(F.desc("ts"), F.desc("event_id")))
    last = (bucketed.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("event_type", "bucket",
                    F.round("value", 4).alias("last_value")))
    stats = (bucketed.groupBy("event_type", "bucket")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.min("value"), 4).alias("min_value"),
                  F.round(F.max("value"), 4).alias("max_value"),
                  F.round(F.sum("value"), 4).alias("sum_value")))
    return (stats.join(last, ["event_type", "bucket"])
            .orderBy("event_type", "bucket"))


DSL_TSDS_DOWNSAMPLE_ORACLE = """
WITH b AS (
  SELECT event_type, value, ts, event_id,
         strftime(make_timestamp(
           CAST(floor(epoch(ts) / 21600) * 21600 * 1000000 AS BIGINT)),
           '%Y-%m-%d %H:%M:%S') AS bucket
  FROM events),
last AS (
  SELECT event_type, bucket, round(value, 4) AS last_value
  FROM (SELECT *, row_number() OVER (
          PARTITION BY event_type, bucket
          ORDER BY ts DESC, event_id DESC) AS rk FROM b)
  WHERE rk = 1),
stats AS (
  SELECT event_type, bucket, count(*) AS n,
         round(min(value), 4) AS min_value,
         round(max(value), 4) AS max_value,
         round(sum(value), 4) AS sum_value
  FROM b GROUP BY event_type, bucket)
SELECT s.event_type, s.bucket, s.n, s.min_value, s.max_value,
       s.sum_value, l.last_value
FROM stats s JOIN last l USING (event_type, bucket)
ORDER BY s.event_type, s.bucket
"""

QUERIES.update({"dsl_tsds_downsample": dsl_tsds_downsample})
ORACLES.update({"dsl_tsds_downsample": DSL_TSDS_DOWNSAMPLE_ORACLE})
