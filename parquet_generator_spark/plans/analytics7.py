"""Analytics wave 7: revenue-distribution diagnostics.

- ``benford_digits``: leading-digit distribution of order totals vs
  Benford's law with per-digit chi-square contributions — the
  classic anomaly/fraud screen over financial facts.
- ``pareto_cumshare``: revenue concentration by customer decile
  (the 80/20 audit). Deciles are assigned by comparing against the
  nine exact revenue percentiles — computed once and attached as
  literals — NOT by a global sort/ntile over the customer frame, so
  the plan stays scale-safe (a billion customers shuffle once for
  the per-customer aggregate and once for the 10-bucket groupBy;
  nothing orders the full frame).
- ``yoy_growth``: year-over-year revenue growth via a self-join of
  the bounded per-year aggregate on year = year+1 (no window, no
  unpartitioned sort; the joined frames are year-cardinality).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_generator_spark.operators.util import broadcast_scalars
from parquet_generator_spark.sources.catalog import load_table

QUERIES: dict = {}
ORACLES: dict = {}


# ------------------------------------------------------ benford_digits

# Benford expected frequencies, one shared literal table for both
# engines (log10 drift cannot enter cross-engine)
_BENFORD = {d: round(math.log10(1.0 + 1.0 / d), 6) for d in range(1, 10)}


def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading digit of o_totalprice vs Benford's law: observed count
    and frequency per digit, expected frequency, and the chi-square
    contribution (obs-exp)^2/exp. The digit is pure arithmetic
    (value / 10^floor(log10 value)) — no string casts in the hot
    path; one 9-bucket groupBy; the corpus total attaches as a
    literal (scalar-subquery pattern)."""
    o = load_table(spark, "orders", sf_dir)
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0),
                F.floor(F.log10("o_totalprice")))).cast("int")
    per = (o.filter(F.col("o_totalprice") > 0)
           .groupBy(digit.alias("digit"))
           .agg(F.count(F.lit(1)).alias("n")))
    tot = per.agg(F.sum("n").alias("total"))
    exp_freq = F.element_at(
        F.array(*[F.lit(_BENFORD[d]) for d in range(1, 10)]),
        F.col("digit"))
    exp_n = F.col("total") * exp_freq
    return (broadcast_scalars(per, tot)
            .select("digit", "n",
                    F.round(F.col("n") / F.col("total"), 6)
                    .alias("obs_freq"),
                    exp_freq.alias("benford_freq"),
                    F.round((F.col("n") - exp_n)
                            * (F.col("n") - exp_n) / exp_n, 4)
                    .alias("chi2_term"))
            .orderBy("digit"))


def _benford_oracle() -> str:
    case = " ".join(f"WHEN {d} THEN {_BENFORD[d]!r}"
                    for d in range(1, 10))
    return f"""
WITH per AS (
  SELECT CAST(floor(o_totalprice
              / power(10.0, floor(log10(o_totalprice)))) AS INT)
           AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice > 0 GROUP BY 1),
tot AS (SELECT sum(n) AS total FROM per)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(n / total, 6) AS obs_freq,
       CAST(CASE digit {case} END AS DOUBLE) AS benford_freq,
       round((n - total * (CASE digit {case} END))
             * (n - total * (CASE digit {case} END))
             / (total * (CASE digit {case} END)), 4) AS chi2_term
FROM per, tot ORDER BY digit
"""


# ---------------------------------------------------- pareto_cumshare

_PCTS = [round(0.1 * i, 1) for i in range(1, 10)]  # 0.1 .. 0.9


def pareto_cumshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration by customer decile: per-customer revenue
    -> decile assignment against the nine EXACT percentiles (attached
    as literals, strict '>' so ties stay in the lower decile) ->
    per-decile customer count, revenue, share, and the cumulative
    share from the TOP decile down (the Pareto curve: cum_share at
    decile 9 = the top-10%% share). The cumulative window runs over
    the bounded 10-row decile frame only."""
    o = load_table(spark, "orders", sf_dir)
    rev = (o.groupBy("o_custkey")
           .agg(F.sum("o_totalprice").alias("rev")))
    qs = rev.agg(F.expr(
        f"percentile(rev, array({', '.join(map(str, _PCTS))}))")
        .alias("qs"), F.sum("rev").alias("total_rev"))
    with_q = broadcast_scalars(rev, qs)
    decile = None
    for i in range(9):
        hit = (F.col("rev") > F.element_at("qs", i + 1)).cast("int")
        decile = hit if decile is None else decile + hit
    per = (with_q
           .select(decile.alias("decile"), "rev", "total_rev")
           .groupBy("decile", "total_rev")
           .agg(F.count(F.lit(1)).alias("n_cust"),
                F.sum("rev").alias("drev")))
    w = (Window.orderBy(F.desc("decile"))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (per.select(
        "decile", "n_cust",
        F.round("drev", 2).alias("revenue"),
        F.round(F.col("drev") / F.col("total_rev"), 6).alias("share"),
        F.round(F.sum(F.col("drev") / F.col("total_rev")).over(w), 6)
        .alias("cum_share_from_top"))
        .orderBy(F.desc("decile")))


PARETO_ORACLE = f"""
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS rev
  FROM orders GROUP BY o_custkey),
qs AS (
  SELECT quantile_cont(rev, [{', '.join(map(str, _PCTS))}]) AS q,
         sum(rev) AS total_rev
  FROM rev),
assigned AS (
  SELECT CAST((rev > q[1]) AS INT) + CAST((rev > q[2]) AS INT)
         + CAST((rev > q[3]) AS INT) + CAST((rev > q[4]) AS INT)
         + CAST((rev > q[5]) AS INT) + CAST((rev > q[6]) AS INT)
         + CAST((rev > q[7]) AS INT) + CAST((rev > q[8]) AS INT)
         + CAST((rev > q[9]) AS INT) AS decile,
         rev, total_rev
  FROM rev, qs),
per AS (
  SELECT decile, total_rev, count(*) AS n_cust, sum(rev) AS drev
  FROM assigned GROUP BY decile, total_rev)
SELECT decile, CAST(n_cust AS BIGINT) AS n_cust,
       round(drev, 2) AS revenue,
       round(drev / total_rev, 6) AS share,
       round(sum(drev / total_rev) OVER (ORDER BY decile DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
         AS cum_share_from_top
FROM per ORDER BY decile DESC
"""


# -------------------------------------------------------- yoy_growth

def yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue: per-year totals (rounded once, so the
    growth ratio divides identical doubles on both engines), joined
    to the previous year on yr = yr+1 — two year-cardinality frames,
    AQE broadcasts, no window over anything unbounded."""
    o = load_table(spark, "orders", sf_dir)
    per = (o.groupBy(F.year("o_orderdate").alias("yr"))
           .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                F.count(F.lit(1)).alias("n_orders")))
    prev = per.select(F.col("yr").alias("pyr"),
                      F.col("revenue").alias("prev_revenue"))
    return (per.join(prev, per.yr == prev.pyr + 1, "left")
            .select("yr", "revenue", "n_orders",
                    F.round(100.0 * (F.col("revenue")
                                     - F.col("prev_revenue"))
                            / F.col("prev_revenue"), 2)
                    .alias("yoy_pct"))
            .orderBy("yr"))


YOY_ORACLE = """
WITH per AS (
  SELECT year(o_orderdate) AS yr,
         round(sum(o_totalprice), 2) AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY 1)
SELECT a.yr, a.revenue, CAST(a.n_orders AS BIGINT) AS n_orders,
       round(100.0 * (a.revenue - b.revenue) / b.revenue, 2)
         AS yoy_pct
FROM per a LEFT JOIN per b ON a.yr = b.yr + 1
ORDER BY a.yr
"""


QUERIES.update({
    "benford_digits": benford_digits,
    "pareto_cumshare": pareto_cumshare,
    "yoy_growth": yoy_growth,
})
ORACLES.update({
    "benford_digits": _benford_oracle(),
    "pareto_cumshare": PARETO_ORACLE,
    "yoy_growth": YOY_ORACLE,
})
