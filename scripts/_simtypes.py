"""Typed-parity helpers shared by the driver-sim scripts.

Round-9 lesson: the driver's value hash is TYPED — a DuckDB oracle
column typed HUGEINT (uncast integer ``sum()``) hash-fails against a
Spark BIGINT even when every value is identical, because the driver's
fetch path renders HUGEINT as float ("5.0" vs "5").  The sim's old
``%.6g``-crushed string compare could never see this class (it cost a
"337/337 MATCH" seal over a 48/50 driver row in round 9).  Two extra
checks close the blind spot:

- ``oracle_type_problems``: DESCRIBE the oracle and flag output
  column types Spark cannot emit (HUGEINT & friends).  Catches the
  demonstrated class even when fetched Python values look identical.
- ``type_class_mismatches``: compare fetched Python type classes per
  column between Spark and DuckDB.  int-vs-float divergence is
  flagged; float-vs-Decimal is deliberately tolerated (DECIMAL-typed
  oracles are proven driver-green — dsl_geo_distance et al.).
"""
import datetime
import decimal

# DuckDB output types the driver cannot hash-match against any Spark
# type (no Spark equivalent; pandas fetch renders them as float/object).
FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                        "USMALLINT", "UTINYINT")


def oracle_type_problems(con, sql):
    """Return [(col, type)] for oracle output columns whose DuckDB
    type Spark cannot emit.  Empty list = safe."""
    desc = con.execute(f"DESCRIBE SELECT * FROM ({sql}) _q").fetchall()
    bad = []
    for row in desc:
        col, typ = row[0], str(row[1]).upper()
        if any(f in typ for f in FORBIDDEN_DUCK_TYPES):
            bad.append((col, row[1]))
    return bad


def _tclass(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, (float, decimal.Decimal)):
        return "float"  # Decimal tolerated: driver-green precedent
    if isinstance(v, datetime.datetime):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, str):
        return "str"
    return type(v).__name__


def type_class_mismatches(srows, scols, drows, dcols):
    """Compare per-column fetched type classes (sorted by column
    name, None-ignoring).  Returns [(col, spark_classes, duck_classes)]
    for columns whose non-null class sets differ."""
    sorder = sorted(range(len(scols)), key=lambda i: scols[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    out = []
    for si, di in zip(sorder, dorder):
        sc = {_tclass(r[si]) for r in srows} - {None}
        dc = {_tclass(r[di]) for r in drows} - {None}
        if sc != dc:
            out.append((scols[si], sorted(sc), sorted(dc)))
    return out
