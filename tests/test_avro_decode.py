"""Full-surface lenient Avro-JSON decode parity: the reference's
ExtendedJsonDecoder.java handles the COMPLETE Avro model (enum,
fixed, bytes, maps, multi-branch unions) when re-encoding JSON with
missing-field null defaults; lenient_decode_avro must reproduce the
same values relationally."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from parquet_generator_spark.schema.avro_io import (
    avro_to_struct,
    lenient_decode_avro,
)

FULL_AVSC = {
    "type": "record",
    "name": "evt",
    "fields": [
        {"name": "id", "type": ["null", "long"], "default": None},
        {"name": "color", "type": ["null", {
            "type": "enum", "name": "Color",
            "symbols": ["RED", "GREEN", "BLUE"]}], "default": None},
        {"name": "payload", "type": ["null", "bytes"], "default": None},
        {"name": "digest", "type": ["null", {
            "type": "fixed", "name": "Digest", "size": 4}],
         "default": None},
        {"name": "tags", "type": ["null", {
            "type": "map", "values": ["null", "long"]}], "default": None},
        {"name": "val", "type": ["null", "long", "string"],
         "default": None},
        {"name": "inner", "type": ["null", {
            "type": "record", "name": "inner_r", "fields": [
                {"name": "a", "type": ["null", "string"],
                 "default": None},
                {"name": "blob", "type": ["null", "bytes"],
                 "default": None},
            ]}], "default": None},
    ],
}


def _decode(spark, docs: list[str]):
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    return df.select(
        lenient_decode_avro(F.col("j"), FULL_AVSC).alias("r")
    ).select("r.*").collect()


def test_avro_struct_mapping_covers_full_model():
    st = avro_to_struct(json.dumps(FULL_AVSC))
    by_name = {f.name: f.dataType.simpleString() for f in st.fields}
    assert by_name["color"] == "string"
    assert by_name["payload"] == "binary"
    assert by_name["digest"] == "binary"
    assert by_name["tags"] == "map<string,bigint>"
    # multi-branch union -> one struct field per branch
    assert by_name["val"] == "struct<long:bigint,string:string>"
    assert by_name["inner"] == "struct<a:string,blob:binary>"


def test_full_document_decodes_every_kind(spark):
    # Avro JSON encoding: bytes/fixed as ISO-8859-1 code-point
    # strings; non-null union values wrapped {"branch": value}
    doc = json.dumps({
        "id": 7,
        "color": "GREEN",
        "payload": "\u00ff\u0000A",
        "digest": "\u0001\u0002\u0003\u0004",
        "tags": {"x": 1, "y": None},
        "val": {"string": "hello"},
        "inner": {"a": "deep", "blob": "\u00e9"},
    })
    [r] = _decode(spark, [doc])
    assert r["id"] == 7
    assert r["color"] == "GREEN"
    assert bytes(r["payload"]) == b"\xff\x00A"
    assert bytes(r["digest"]) == b"\x01\x02\x03\x04"
    assert r["tags"] == {"x": 1, "y": None}
    assert r["val"]["long"] is None and r["val"]["string"] == "hello"
    assert r["inner"]["a"] == "deep"
    assert bytes(r["inner"]["blob"]) == b"\xe9"


def test_missing_fields_null_fill_at_every_depth(spark):
    # ExtendedJsonDecoder.java:719-726: absent field -> null default,
    # at any depth — the decoder's defining behavior
    [r] = _decode(spark, [json.dumps({"inner": {}})])
    assert r["id"] is None and r["color"] is None
    assert r["payload"] is None and r["tags"] is None
    assert r["val"] is None
    assert r["inner"]["a"] is None and r["inner"]["blob"] is None


def test_enum_symbol_domain_validated(spark):
    # invalid enum symbol -> null (the lenient twin of the decoder's
    # AvroTypeException; documented adaptation)
    [ok, bad] = _decode(spark, [json.dumps({"color": "BLUE"}),
                                json.dumps({"color": "MAGENTA"})])
    assert ok["color"] == "BLUE"
    assert bad["color"] is None


def test_union_long_branch_and_roundtrip_bytes(spark):
    [r] = _decode(spark, [json.dumps({"val": {"long": 42}})])
    assert r["val"]["long"] == 42 and r["val"]["string"] is None
    # bytes survive a full 0..255 alphabet through the ISO-8859-1 path
    alphabet = "".join(chr(i) for i in range(256))
    [r2] = _decode(spark, [json.dumps({"payload": alphabet})])
    assert bytes(r2["payload"]) == bytes(range(256))
