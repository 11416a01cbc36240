"""StructType <-> Avro record schema (.asvc) conversion.

Reference parity: Bootstrap.java:182-194 writes the inferred schema
as ``<rule>/schema.asvc`` with every field a ``["null", T]`` union
defaulting to null (Bootstrap.java:221-232). This module reproduces
that exact file shape from a Spark StructType and can read the
reference's own ``office365_signin/schema.asvc`` back into a
StructType (parity-tested in tests/test_schema.py).

Only the public Avro 1.x specification is used.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

_PRIMITIVE_TO_AVRO = {
    "string": "string",
    "long": "long",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "local-timestamp-micros"},
}

_AVRO_TO_SPARK = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "null": T.NullType(),
}


def _type_to_avro(dt: T.DataType, name: str, namespace: str = "") -> object:
    tn = dt.typeName()
    if tn in _PRIMITIVE_TO_AVRO:
        return _PRIMITIVE_TO_AVRO[tn]
    if isinstance(dt, T.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.ArrayType):
        return {"type": "array",
                "items": _nullable(_type_to_avro(dt.elementType, name + "_item"))}
    if isinstance(dt, T.MapType):
        return {"type": "map",
                "values": _nullable(_type_to_avro(dt.valueType, name + "_value"))}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "fields": [
                {"name": f.name,
                 "type": _nullable(_type_to_avro(f.dataType, f.name)),
                 "default": None}
                for f in dt.fields
            ],
        }
    raise TypeError(f"cannot map Spark type {dt} to Avro")


def _nullable(avro_type: object) -> list:
    """The reference's enableDefaultValue union shape: ["null", T]."""
    if isinstance(avro_type, list):
        return avro_type
    return ["null", avro_type]


def struct_to_avro(schema: T.StructType, name: str,
                   doc: str | None = None) -> str:
    """Serialize a StructType as an Avro record schema JSON string,
    every field nullable with null default (schema.asvc shape)."""
    record = _type_to_avro(schema, name.replace("-", "_"))
    if doc:
        record["doc"] = doc
    return json.dumps(record, separators=(",", ":"))


def _avro_type_to_spark(t: object) -> T.DataType:
    if isinstance(t, str):
        if t in _AVRO_TO_SPARK:
            return _AVRO_TO_SPARK[t]
        raise TypeError(f"unsupported avro primitive {t!r}")
    if isinstance(t, list):  # union — drop null, take first non-null
        non_null = [x for x in t if x != "null"]
        return _avro_type_to_spark(non_null[0]) if non_null else T.NullType()
    if isinstance(t, dict):
        kind = t["type"]
        logical = t.get("logicalType")
        if logical in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType()
        if logical in ("local-timestamp-micros", "local-timestamp-millis"):
            return T.TimestampNTZType()
        if logical == "date":
            return T.DateType()
        if logical == "decimal":
            return T.DecimalType(t.get("precision", 38), t.get("scale", 18))
        if kind == "array":
            return T.ArrayType(_avro_type_to_spark(t["items"]), True)
        if kind == "map":
            return T.MapType(T.StringType(),
                             _avro_type_to_spark(t["values"]), True)
        if kind in ("record", "error"):  # "error" = record variant
                                         # (Avro protocol spec); the
                                         # reference's kitesdk-inferred
                                         # schema.asvc uses it
            return T.StructType([
                T.StructField(f["name"], _avro_type_to_spark(f["type"]), True)
                for f in t["fields"]])
        return _avro_type_to_spark(kind)
    raise TypeError(f"unsupported avro type {t!r}")


def avro_to_struct(avsc: str | dict) -> T.StructType:
    """Parse an Avro record schema (e.g. the reference's schema.asvc)
    into a Spark StructType."""
    record = json.loads(avsc) if isinstance(avsc, str) else avsc
    dt = _avro_type_to_spark(record)
    if not isinstance(dt, T.StructType):
        raise TypeError("top-level avro schema must be a record")
    return dt
