"""Property test: randomly composed ES|QL pipelines render to the
same result through BOTH engines (Spark DataFrame ops vs the DuckDB
oracle SQL) — the structural-parity claim of operators/esql.py's
one-parse/two-renderers design, checked over the generated grammar
instead of hand-picked pipelines.

Generation notes:
- pipelines are random command walks; candidates that trip a parse
  fence (e.g. DROP of an active sort column, ENRICH after SORT) are
  discarded with assume() — fences are tested separately.
- aggregates are restricted to the EXACT set (COUNT / MIN / MAX /
  COUNT_DISTINCT / SUM of integers): cross-engine float-sum ulp
  drift is a documented non-goal of the %.6g comparison and would
  make the fuzzer flaky, not informative.
- every pipeline ends in STATS or LIMIT so collected results stay
  bounded.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from parquet_generator_spark.operators.esql import (
    esql_df,
    esql_duck_sql,
    parse_esql,
)

SF = "/root/testdata/sf0.001"

_WHERE = st.sampled_from([
    "value >= 50", "value < 25 OR value > 90",
    'event_type == "click"', 'event_type != "view"',
    'event_type IN ("click", "purchase")',
    'event_type LIKE "c*"', 'event_type RLIKE "v.*w"',
    "user_id % 7 == 3", "NOT (value >= 10 AND value <= 95)",
])

_EVAL = st.sampled_from([
    "b = user_id % 5", "v2 = value * 2 + 1",
    "u = UPPER(event_type)", "l = LENGTH(event_type)",
    'tag = CONCAT(event_type, "_x")',
    'c = CASE(value >= 50, "hi", "lo")',
    'h = DATE_EXTRACT("hour_of_day", ts)',
    "k = TO_LONG(value)",
    "k2 = TO_INTEGER(value * 3)",
    'le = LEFT(event_type, 3)', 'ri = RIGHT(event_type, 2)',
    'rp = REPLACE(event_type, "c", "K")',
    "rv = REVERSE(event_type)",
    'lo2 = LOCATE(event_type, "ur")',
    "tl = TO_LOWER(TO_UPPER(event_type))",
    'dd = DATE_DIFF("hour", DATE_TRUNC(1 day, ts), ts)',
    "bn = BUCKET(value, 20.0)",
    "gl = GREATEST(LEAST(user_id, 40), 10)",
])

_AGG = st.sampled_from([
    "n = COUNT(*)", "mx = MAX(value)", "mn = MIN(value)",
    "u = COUNT_DISTINCT(user_id)", "s = SUM(user_id)",
    "me = MAX(event_id)",
    # per-aggregate filters (exact aggregates only)
    "nh = COUNT(*) WHERE value >= 60",
    'sp = SUM(user_id) WHERE event_type == "view"',
    # deterministic multivalue aggregates (string-exact)
    't = TOP(event_type, 2, "desc")',
    "v = VALUES(event_type)",
])

_BY = st.sampled_from([
    "event_type", "b2 = user_id % 3", "event_type, b3 = user_id % 2",
])

_SORT = st.sampled_from([
    "value DESC, event_id", "event_id", "user_id, event_id",
    "value DESC NULLS LAST, event_id",
    "event_type ASC NULLS FIRST, event_id DESC",
])


@st.composite
def _pipeline(draw):
    cmds = []
    if draw(st.booleans()):
        # deterministic SAMPLE rides the scan filter; the test
        # parses with sample_key="event_id"
        cmds.append(f"SAMPLE 0.{draw(st.integers(3, 8))}")
    for _ in range(draw(st.integers(0, 2))):
        kind = draw(st.sampled_from(["where", "eval"]))
        cmds.append("WHERE " + draw(_WHERE) if kind == "where"
                    else "EVAL " + draw(_EVAL))
    if draw(st.booleans()):
        # FORK: two full-row branches (deterministic — no
        # branch-local LIMIT without its own sort), BY-NAME
        # null-fill exercised via the branch-only eval column
        cmds.append("FORK (WHERE value >= 50) "
                    "(WHERE value < 50 | EVAL low = 1)")
    if draw(st.booleans()):
        aggs = ", ".join(draw(st.lists(_AGG, min_size=1, max_size=2,
                                       unique=True)))
        cmds.append(f"STATS {aggs} BY {draw(_BY)}")
        if draw(st.booleans()):
            cmds.append("WHERE n >= 1" if "n = COUNT(*)" in aggs
                        else "LIMIT 40")
        cmds.append("LIMIT 50")
    else:
        cmds.append("SORT " + draw(_SORT))
        if draw(st.booleans()):
            cmds.append("KEEP event_id, event_type, value")
        cmds.append(f"LIMIT {draw(st.integers(1, 30))}")
    return "FROM events | " + " | ".join(cmds)


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else f"{v:.6g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def _cached(spark):
    from parquet_generator_spark.sources.catalog import load_table

    df = load_table(spark, "events", SF).persist()
    df.count()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    yield df, con
    df.unpersist()


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(q=_pipeline())
def test_generated_pipelines_agree(q, _cached):
    df, con = _cached
    try:
        plan = parse_esql(q, sample_key="event_id")
    except ValueError:
        assume(False)  # tripped a fence — fences tested elsewhere
        return
    sdf = esql_df(df, plan)
    s = _norm([tuple(r) for r in sdf.collect()], sdf.columns)
    cur = con.execute(esql_duck_sql(plan))
    d = _norm(cur.fetchall(), [c[0] for c in cur.description])
    assert s == d, f"engines diverged on: {q}"
