"""ES|QL (the Elasticsearch piped query language, ES 8.11+) over
DataFrames: a bounded, loudly-fenced subset of the public grammar —
the pipeline shape every Kibana ES|QL panel ships:

    FROM <index>
      | WHERE <boolean expr>
      | EVAL <name> = <expr> [, ...]
      | STATS <name> = <AGG>(<expr>) [, ...] [BY <col> [, ...]]
      | SORT <col> [ASC|DESC] [, ...]
      | KEEP <col> [, ...]
      | LIMIT <n>

One parse produces one command list; two renderers consume it — a
DataFrame builder (filter/withColumn/groupBy/agg/orderBy/limit, all
codegen) and a DuckDB SQL string — so the Spark plan and the oracle
cannot drift (the painless/s_stem shared-generator pattern).

Expression subset (validated token-by-token, unsupported syntax
raises): column refs, numeric/string literals, + - * / %,
comparisons (== != > >= < <=), NOT/AND/OR, parentheses, and the
functions ABS/ROUND/SQRT/LENGTH/LOWER/UPPER/CONCAT. ES|QL's ``==``
becomes SQL ``=``, ``!=`` becomes ``<>``. Aggregates: COUNT(*) /
COUNT / SUM / AVG / MIN / MAX / COUNT_DISTINCT.

Deliberate fences (documented, raise ValueError): WHERE after
STATS, nested STATS, DISSECT/GROK/ENRICH/MV_* (no runtime lookup
surface here), and date functions (use the date-math translator's
plan_clock path instead).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FUNCS = {"ABS": "abs", "ROUND": "round", "SQRT": "sqrt",
          "LENGTH": "length", "LOWER": "lower", "UPPER": "upper",
          "CONCAT": "concat"}
_AGGS = {"COUNT": "count", "SUM": "sum", "AVG": "avg",
         "MIN": "min", "MAX": "max",
         "COUNT_DISTINCT": "count(DISTINCT {})"}

_TOKEN_RE = re.compile(
    r"\s*(>=|<=|!=|==|[()+\-*/%,<>]|\"(?:[^\"\\]|\\.)*\"|"
    r"'(?:[^'\\]|\\.)*'|[A-Za-z_][A-Za-z0-9_]*|\d+\.\d+|\d+)")

_UNSUPPORTED = ("DISSECT", "GROK", "ENRICH", "MV_EXPAND", "RENAME",
                "DROP", "ROW", "SHOW", "LOOKUP")


def _render_expr(expr: str) -> str:
    """Validate + translate one ES|QL value/boolean expression into
    engine-neutral SQL text."""
    out, pos = [], 0
    while pos < len(expr):
        if expr[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(expr, pos)
        if not m:
            raise ValueError(f"esql: unsupported syntax at "
                             f"{expr[pos:pos + 20]!r}")
        tok = m.group(1)
        pos = m.end()
        if tok == "==":
            out.append("=")
        elif tok == "!=":
            out.append("<>")
        elif tok.startswith('"'):
            # ES|QL strings are double-quoted; SQL wants single
            inner = tok[1:-1].replace("\\\"", "\"")
            out.append("'" + inner.replace("'", "''") + "'")
        elif re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", tok):
            up = tok.upper()
            if up in _FUNCS:
                out.append(_FUNCS[up])
            elif up in ("AND", "OR", "NOT", "IS", "NULL", "IN",
                        "LIKE", "TRUE", "FALSE"):
                out.append(up)
            elif up in _AGGS:
                raise ValueError(
                    f"esql: aggregate {tok} outside STATS")
            else:
                out.append(tok)  # column reference
        else:
            out.append(tok)
    return " ".join(out)


@dataclass
class _Stats:
    aggs: list = field(default_factory=list)  # (alias, sql_text)
    by: list = field(default_factory=list)


def _render_agg(alias: str, call: str) -> str:
    m = re.fullmatch(r"\s*([A-Za-z_]+)\s*\((.*)\)\s*", call, re.S)
    if not m:
        raise ValueError(f"esql: STATS needs AGG(expr), got {call!r}")
    name, arg = m.group(1).upper(), m.group(2).strip()
    if name not in _AGGS:
        raise ValueError(f"esql: unsupported aggregate {name}")
    if name == "COUNT" and (arg == "*" or arg == ""):
        return f"count(*) AS {alias}"
    inner = _render_expr(arg)
    if name == "COUNT_DISTINCT":
        return f"count(DISTINCT {inner}) AS {alias}"
    return f"{_AGGS[name]}({inner}) AS {alias}"


@dataclass
class EsqlPlan:
    """Parsed pipeline: table + ordered command list."""
    table: str
    wheres: list = field(default_factory=list)
    evals: list = field(default_factory=list)   # (name, sql)
    stats: _Stats | None = None
    sorts: list = field(default_factory=list)   # (col, asc)
    keeps: list | None = None
    limit: int | None = None


def parse_esql(query: str) -> EsqlPlan:
    parts = [p.strip() for p in query.strip().split("|")]
    head = parts[0]
    m = re.fullmatch(r"FROM\s+([A-Za-z_][A-Za-z0-9_]*)", head, re.I)
    if not m:
        raise ValueError("esql: pipeline must start with FROM <index>")
    plan = EsqlPlan(table=m.group(1))
    for cmd in parts[1:]:
        kw = cmd.split(None, 1)[0].upper() if cmd else ""
        body = cmd[len(kw):].strip()
        if kw in _UNSUPPORTED:
            raise ValueError(f"esql: {kw} is not supported (bounded "
                             f"subset; see operators/esql.py)")
        if kw == "WHERE":
            if plan.stats:
                raise ValueError("esql: WHERE after STATS is not "
                                 "supported — filter before STATS")
            plan.wheres.append(_render_expr(body))
        elif kw == "EVAL":
            if plan.stats:
                raise ValueError("esql: EVAL after STATS unsupported")
            for assign in _split_top(body):
                name, _, rhs = assign.partition("=")
                if not _:
                    raise ValueError(f"esql: EVAL needs name = expr, "
                                     f"got {assign!r}")
                plan.evals.append((name.strip(), _render_expr(rhs)))
        elif kw == "STATS":
            if plan.stats:
                raise ValueError("esql: nested STATS unsupported")
            st = _Stats()
            agg_part, _, by_part = body.partition(" BY ")
            if not _:
                agg_part, _, by_part = body.partition(" by ")
            for assign in _split_top(agg_part):
                name, eq, rhs = assign.partition("=")
                if not eq:
                    raise ValueError("esql: STATS needs name = "
                                     "AGG(expr)")
                st.aggs.append((name.strip(),
                                _render_agg(name.strip(),
                                            rhs.strip())))
            if by_part:
                st.by = [c.strip() for c in by_part.split(",")]
            plan.stats = st
        elif kw == "SORT":
            for c in body.split(","):
                bits = c.split()
                asc = not (len(bits) > 1 and bits[1].upper() == "DESC")
                plan.sorts.append((bits[0], asc))
        elif kw == "KEEP":
            plan.keeps = [c.strip() for c in body.split(",")]
        elif kw == "LIMIT":
            plan.limit = int(body)
        else:
            raise ValueError(f"esql: unknown command {kw!r}")
    return plan


def _split_top(s: str) -> list[str]:
    """Split on commas outside parens/strings."""
    out, depth, start, in_s = [], 0, 0, None
    for i, ch in enumerate(s):
        if in_s:
            if ch == in_s:
                in_s = None
            continue
        if ch in "'\"":
            in_s = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p for p in (x.strip() for x in out) if p]


def esql_df(df: DataFrame, plan: EsqlPlan) -> DataFrame:
    """Render the parsed pipeline over an already-loaded DataFrame
    (the FROM resolution stays with the caller's catalog)."""
    for w in plan.wheres:
        df = df.filter(F.expr(w))
    for name, sql in plan.evals:
        df = df.withColumn(name, F.expr(sql))
    if plan.stats:
        aggs = [F.expr(a.rsplit(" AS ", 1)[0]).alias(n)
                for n, a in plan.stats.aggs]
        df = (df.groupBy(*plan.stats.by).agg(*aggs)
              if plan.stats.by else df.agg(*aggs))
    if plan.sorts:
        df = df.orderBy(*[F.asc(c) if asc else F.desc(c)
                          for c, asc in plan.sorts])
    if plan.keeps:
        df = df.select(*plan.keeps)
    if plan.limit is not None:
        df = df.limit(plan.limit)
    return df


def esql_duck_sql(plan: EsqlPlan) -> str:
    """Render the same pipeline as one DuckDB SQL statement."""
    base = plan.table
    where = (" WHERE " + " AND ".join(f"({w})" for w in plan.wheres)
             if plan.wheres else "")
    evals = "".join(f", {sql} AS {name}" for name, sql in plan.evals)
    inner = f"SELECT *{evals} FROM {base}{where}"
    if plan.stats:
        sel = ", ".join(plan.stats.by
                        + [a for _, a in plan.stats.aggs])
        group = (" GROUP BY " + ", ".join(plan.stats.by)
                 if plan.stats.by else "")
        sql = f"SELECT {sel} FROM ({inner}) _e{group}"
    else:
        sql = inner
    if plan.sorts:
        sql += " ORDER BY " + ", ".join(
            f"{c} {'ASC' if asc else 'DESC'}" for c, asc in plan.sorts)
    if plan.keeps:
        sql = (f"SELECT {', '.join(plan.keeps)} FROM ({sql}) _k"
               + (" ORDER BY " + ", ".join(
                   f"{c} {'ASC' if asc else 'DESC'}"
                   for c, asc in plan.sorts if c in plan.keeps)
                  if plan.sorts else ""))
    if plan.limit is not None:
        sql += f" LIMIT {plan.limit}"
    return sql
