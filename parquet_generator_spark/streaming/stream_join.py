"""Stream-stream time-interval join: clicks matched to the views they
followed within a bounded interval.

Spark's stream-stream join keeps both sides in state until the
watermark plus the join interval passes, so the time bound is what
makes 100 TB/day streams feasible: state is (rate x interval), not
unbounded. The same builder runs on batch DataFrames (oracle-checked)
and readStream sources (test-checked) — the repo's standard
batch/stream parity shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "10 minutes"


def view_click_pairs(views: DataFrame, clicks: DataFrame,
                     watermark: str | None = None,
                     how: str = "inner") -> DataFrame:
    """Pairs (user_id, v_ts, c_ts): each click joined to every view by
    the same user in the preceding ATTRIBUTION_WINDOW. With
    ``watermark`` set (streaming), both sides are watermarked and the
    interval condition bounds the join state. ``how='left_outer'``
    also emits unconverted views (c_ts null) — in streaming these
    flush only once the watermark passes the view's join interval,
    which is exactly the state-expiry bound."""
    v = (views.filter(F.col("event_type") == "view")
         .select("user_id", F.col("ts").alias("v_ts")))
    c = (clicks.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("c_user"),
                 F.col("ts").alias("c_ts")))
    if watermark is not None:
        v = v.withWatermark("v_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    return (v.join(c, (F.col("user_id") == F.col("c_user"))
                   & (F.col("c_ts") > F.col("v_ts"))
                   & (F.col("c_ts") <= F.col("v_ts")
                      + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")),
                   how)
            .select("user_id", "v_ts", "c_ts"))


PAIRS_ORACLE = """
SELECT v.user_id, count(*) AS n_pairs,
       count(DISTINCT v.v_ts) AS n_views_hit
FROM (SELECT user_id, ts AS v_ts FROM events
      WHERE event_type = 'view') v
JOIN (SELECT user_id, ts AS c_ts FROM events
      WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.c_ts > v.v_ts
 AND c.c_ts <= v.v_ts + INTERVAL 10 MINUTE
GROUP BY v.user_id
ORDER BY v.user_id
"""
