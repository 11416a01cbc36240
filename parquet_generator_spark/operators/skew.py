"""Skew-handling operators: salted aggregation and salted join.

AQE's skewJoin splitting handles most skew at runtime; these are the
explicit forms for when a key is SO hot that even a split partition
overwhelms one task (the classic power-law key in web/event data).
Both produce results identical to their plain equivalents — salting
only changes the physical distribution — so they are verified against
plain-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_of(col: str, n_salt: int) -> Column:
    # deterministic salt from a high-cardinality sibling column: the
    # hot key's rows spread over n_salt sub-keys without RNG (keeps
    # retries/speculative tasks idempotent)
    return F.pmod(F.hash(F.col(col)), F.lit(n_salt))


def salted_agg(df: DataFrame, group_col: str, salt_from: str,
               aggs: dict[str, Column], n_salt: int = DEFAULT_SALTS) -> DataFrame:
    """Two-stage skew-proof aggregation: stage 1 shuffles on
    (key, salt) so a hot key fans out over n_salt reducers; stage 2
    merges the n_salt partials per key (tiny shuffle).

    ``aggs`` maps output name -> stage-1 aggregate; stage 2 re-merges
    with sum() (valid for algebraic aggregates: count/sum; extend the
    merge map for min/max)."""
    stage1 = (df.withColumn("_salt", _salt_of(salt_from, n_salt))
              .groupBy(group_col, "_salt")
              .agg(*[a.alias(name) for name, a in aggs.items()]))
    return (stage1.groupBy(group_col)
            .agg(*[F.sum(name).alias(name) for name in aggs]))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_from: str, n_salt: int = DEFAULT_SALTS) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a deterministic salt,
    the (smaller) dim side is replicated n_salt times with every salt
    value, and the join key becomes (key, salt) — a hot fact key now
    lands on n_salt reducers instead of one. Replication cost is
    n_salt * |dim|, the standard trade."""
    salted_fact = fact.withColumn("_salt", _salt_of(salt_from, n_salt))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")
