"""SCD Type-2 merge: history-preserving dimension maintenance.

Each key keeps a timeline of attribute versions — `valid_from`,
`valid_to` (NULL = current). Merging a snapshot batch closes the
current row of every key whose tracked attributes changed and opens
a new current row; new keys open their first row; unchanged keys
pass through untouched. This is the MERGE a Delta/Iceberg table
would run natively; expressed relationally it is one full-outer join
on the key plus unions — no windows, no state outside the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(existing: DataFrame, batch: DataFrame,
               key_cols: list[str], attr_cols: list[str],
               ts_col: str = "ts") -> DataFrame:
    """``existing``: key_cols + attr_cols + valid_from + valid_to
    (NULL marks the current row). ``batch``: key_cols + attr_cols +
    ``ts_col`` (one snapshot row per key — pre-deduplicate with
    latest-wins if needed). Returns the merged table.

    Join cost: current-rows x batch on the key — both sides are
    key-cardinality, not history-cardinality; closed history rows
    never enter the join.
    """
    hist = existing.filter(F.col("valid_to").isNotNull())
    cur = existing.filter(F.col("valid_to").isNull())

    c = cur.select(*key_cols,
                   *[F.col(a).alias(f"c_{a}") for a in attr_cols],
                   F.col("valid_from").alias("c_from"))
    b = batch.select(*key_cols,
                     *[F.col(a).alias(f"b_{a}") for a in attr_cols],
                     F.col(ts_col).alias("b_ts"))
    j = c.join(b, key_cols, "full_outer")

    # null-safe change detection: any tracked attribute differs
    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(f"c_{a}").eqNullSafe(F.col(f"b_{a}"))
    has_c = F.col("c_from").isNotNull()
    has_b = F.col("b_ts").isNotNull()

    closed = (j.filter(has_c & has_b & changed)
              .select(*key_cols,
                      *[F.col(f"c_{a}").alias(a) for a in attr_cols],
                      F.col("c_from").alias("valid_from"),
                      F.col("b_ts").alias("valid_to")))
    opened = (j.filter(has_b & (~has_c | changed))
              .select(*key_cols,
                      *[F.col(f"b_{a}").alias(a) for a in attr_cols],
                      F.col("b_ts").alias("valid_from"),
                      F.lit(None).cast("timestamp").alias("valid_to")))
    unchanged = (j.filter(has_c & (~has_b | ~changed))
                 .select(*key_cols,
                         *[F.col(f"c_{a}").alias(a) for a in attr_cols],
                         F.col("c_from").alias("valid_from"),
                         F.lit(None).cast("timestamp")
                         .alias("valid_to")))
    return hist.unionByName(closed).unionByName(opened) \
        .unionByName(unchanged)
