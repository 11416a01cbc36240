"""Stateful streaming operators.

- Streaming dedup: dropDuplicatesWithinWatermark — state bounded by
  the watermark horizon, the only dedup that survives an unbounded
  stream (a full-history dropDuplicates grows state forever).
- Session windows: the built-in session_window gap-merge — same plan
  works in batch (oracle-checkable) and streaming (watermarked).
- Custom state: applyInPandasWithState running per-user purchase
  totals — the template for operators Spark lacks natively.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP = "30 minutes"
SESSION_GAP_SECONDS = 1800


def stream_dedup(df: DataFrame, key_cols: list[str],
                 watermark: str | None = None,
                 ts_col: str = "ts") -> DataFrame:
    """Drop duplicate records by key. On a stream, pass ``watermark``:
    state is purged past the horizon, so memory is O(keys per
    horizon), not O(all keys ever)."""
    if watermark is not None:
        return (df.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(key_cols))
    return df.dropDuplicates(key_cols)


def session_window_agg(df: DataFrame, watermark: str | None = None,
                       ts_col: str = "ts",
                       key_col: str = "user_id") -> DataFrame:
    """Per-key session aggregation with the native session_window
    (gap = 30 min): one shuffle on the key; sessions merge at overlap.
    Streaming needs the watermark so closed sessions emit and their
    state drops."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.session_window(ts_col, SESSION_GAP).alias("sw"),
                        key_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col(key_col),
                    F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    "n_events", "sum_value"))


SESSION_WINDOW_ORACLE = f"""
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > {SESSION_GAP_SECONDS}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("total", T.DoubleType()),
])

RUNNING_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_purchases", T.LongType()),
    T.StructField("total_spend", T.DoubleType()),
])


def _running_totals(key: tuple[Any, ...],
                    pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    """Accumulate (count, sum) per user across micro-batches and emit
    the updated running totals once per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_purchases": [n],
                        "total_spend": [total]})


def running_purchase_totals(df: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running purchase totals via
    applyInPandasWithState (Arrow-batched, state per group key,
    NoTimeout — totals never expire). The template for semantics the
    built-in operators can't express."""
    return (df.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .applyInPandasWithState(
                _running_totals,
                outputStructType=RUNNING_OUTPUT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
