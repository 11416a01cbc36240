"""Watermarked windowed aggregation — one plan shape shared by the
batch query (oracle-checked) and the streaming query (test-checked):
tumbling windows aligned to the epoch, counts + value sums per
event_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "6 hours"
WINDOW_SECONDS = 6 * 3600


def windowed_event_counts(df: DataFrame, watermark: str | None = None,
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """Tumbling-window counts per key. Pass ``watermark`` (e.g.
    "1 hour") on streams so state for closed windows is dropped —
    unbounded state is the classic 100 TB streaming failure mode."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.window(ts_col, WINDOW).alias("win"), key_col)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                    F.col(key_col), "n", "sum_value"))


WINDOWED_ORACLE = f"""
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / {WINDOW_SECONDS})
                                    * {WINDOW_SECONDS} * 1000000 AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


SLIDE_SECONDS = 3 * 3600  # window 6h sliding every 3h: 2 windows/event


def sliding_event_counts(df: DataFrame, watermark: str | None = None,
                         ts_col: str = "ts",
                         key_col: str = "event_type") -> DataFrame:
    """SLIDING-window counts per key (6h window every 3h): each event
    lands in window/slide = 2 overlapping windows. Same plan on batch
    and stream; on a stream the state is (windows-open x keys), and
    the watermark closes windows so the overlap factor — not the
    stream length — bounds state size."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.window(ts_col, WINDOW, "3 hours").alias("win"),
                        key_col)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                    F.col(key_col), "n", "sum_value"))


# every event belongs to exactly window/slide = 2 windows whose starts
# are the two slide-aligned ticks at or before ts and within 6h of it
SLIDING_ORACLE = f"""
SELECT strftime(make_timestamp(
         CAST((floor(epoch(ts) / {SLIDE_SECONDS}) - i.i)
              * {SLIDE_SECONDS} * 1000000 AS BIGINT)),
       '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events, (SELECT unnest(range(2)) AS i) i
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


HLL_RSD = 0.02


def windowed_distinct_users(df: DataFrame, watermark: str | None = None,
                            ts_col: str = "ts") -> DataFrame:
    """Tumbling-window APPROX distinct users per event_type — the
    constant-memory streaming cardinality monitor. HLL++ buffers
    merge associatively and deterministically, so the streaming
    incremental merge equals the batch aggregate bit-for-bit
    (asserted in tests); on a stream the watermark bounds state to
    open windows x keys x one sketch."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.window(ts_col, WINDOW).alias("win"),
                        "event_type")
            .agg(F.approx_count_distinct("user_id", rsd=HLL_RSD)
                 .alias("approx_users"),
                 F.count(F.lit(1)).alias("n"))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                    "event_type", "n", "approx_users"))


WINDOW_DISTINCT_ORACLE = f"""
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / {WINDOW_SECONDS})
                                    * {WINDOW_SECONDS} * 1000000 AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_ok
FROM events
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""
