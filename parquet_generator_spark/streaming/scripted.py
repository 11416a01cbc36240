"""Windowed scripted_metric folds on a stream.

The bounded painless-fold subset (operators/esdsl.py) compiles
scripted_metric to an associative Catalyst aggregate — which is
exactly what Structured Streaming's incremental execution needs:
sum/max folds merge across micro-batches with bounded per-window
state, so the SAME aggregate Columns run the batch twin
(oracle-checked) and the stream (test-checked, watermarked so closed
windows drop state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from parquet_generator_spark.operators.esdsl import _scripted_metric_col
from parquet_generator_spark.streaming.windowed import (
    WINDOW,
    WINDOW_SECONDS,
)

# the ES reference docs' profit example: one fold per doc, quantized
# to cents in-script so the sum is an exact integer-valued double
PROFIT_SPEC = {
    "init_script": "state.t = []",
    "map_script":
        "state.t.add(doc.event_type.value == 'purchase'"
        " ? Math.round(doc.value.value * 100)"
        " : -1 * Math.round(doc.value.value * 100))",
    "combine_script":
        "long p = 0; for (t in state.t) { p += t } return p",
    "reduce_script":
        "long p = 0; for (a in states) { p += a } return p",
}
PEAK_SPEC = {
    "init_script": "state.m = 0",
    "map_script":
        "state.m = Math.max(state.m, Math.round(doc.value.value * 100))",
    "combine_script":
        "long m = 0; for (s in state.m) m = Math.max(m, s); return m",
    "reduce_script":
        "long m = 0; for (a in states) m = Math.max(m, a); return m",
}


def windowed_scripted_folds(df: DataFrame,
                            watermark: str | None = None,
                            ts_col: str = "ts") -> DataFrame:
    """Tumbling-window scripted_metric folds (profit sum + peak max),
    identical plan on batch and stream."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return (src.groupBy(F.window(ts_col, WINDOW).alias("win"))
            .agg(F.count(F.lit(1)).alias("n"),
                 _scripted_metric_col("profit_cents", PROFIT_SPEC),
                 _scripted_metric_col("peak_cents", PEAK_SPEC))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                    "n", "profit_cents", "peak_cents"))


SCRIPTED_FOLDS_ORACLE = f"""
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / {WINDOW_SECONDS})
                                    * {WINDOW_SECONDS} * 1000000 AS BIGINT)),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       CAST(count(*) AS BIGINT) AS n,
       sum(CASE WHEN event_type = 'purchase' THEN round(value * 100)
                ELSE -round(value * 100) END) AS profit_cents,
       max(round(value * 100)) AS peak_cents
FROM events
GROUP BY win_start
ORDER BY win_start
"""
