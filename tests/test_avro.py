"""Pure-Python Avro codec: spec round-trips, Confluent framing, the Spark
converter seam, and the envelope schema derivation.

Reference contract: AvroIntegrationTest.java:135-137 (AvroConverter records),
README.md:357-405 (envelope in Avro terms). The codec itself is implemented
from the public Apache Avro binary-encoding spec — no avro/fastavro/spark-avro
in this container.
"""

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connector_s3_sink_spark.formats import avro

RECORD_SCHEMA = {
    "type": "record",
    "name": "value",
    "fields": [{"name": "name", "type": "string"}],
}

COMPLEX_SCHEMA = {
    "type": "record",
    "name": "everything",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "raw", "type": "bytes"},
        {"name": "maybe", "type": ["null", "long"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "color", "type": {"type": "enum", "name": "c", "symbols": ["R", "G"]}},
        {"name": "fix", "type": {"type": "fixed", "name": "f4", "size": 4}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [{"name": "x", "type": "int"}],
            },
        },
    ],
}

COMPLEX_VALUE = {
    "b": True,
    "i": -42,
    "l": 2**62,
    "d": 3.5,
    "s": "héllo-文",
    "raw": bytes([0, 255, 128]),
    "maybe": None,
    "tags": ["a", "b", ""],
    "attrs": {"k1": 1, "k2": -2},
    "color": "G",
    "fix": b"\x01\x02\x03\x04",
    "nested": {"x": 7},
}


def test_complex_record_roundtrip():
    payload = avro.encode(COMPLEX_VALUE, COMPLEX_SCHEMA)
    assert avro.decode(payload, COMPLEX_SCHEMA) == COMPLEX_VALUE


def test_confluent_framing_roundtrip_and_bad_magic():
    payload = avro.encode({"name": "u"}, RECORD_SCHEMA, confluent_schema_id=7)
    assert payload[0] == 0 and payload[1:5] == (7).to_bytes(4, "big")
    assert avro.decode(payload, RECORD_SCHEMA, confluent_framing=True) == {
        "name": "u"
    }
    with pytest.raises(avro.AvroError, match="magic"):
        avro.decode(b"\x01" + payload[1:], RECORD_SCHEMA, confluent_framing=True)


def test_truncated_and_trailing_payloads_raise():
    payload = avro.encode({"name": "user-1"}, RECORD_SCHEMA)
    with pytest.raises(avro.AvroError, match="truncated"):
        avro.decode(payload[:-1], RECORD_SCHEMA)
    with pytest.raises(avro.AvroError, match="trailing"):
        avro.decode(payload + b"\x00", RECORD_SCHEMA)


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=80),
    st.binary(max_size=80),
    st.booleans(),
)
def test_fuzz_primitive_roundtrip(n, s, raw, flag):
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "n", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "raw", "type": "bytes"},
            {"name": "flag", "type": "boolean"},
        ],
    }
    value = {"n": n, "s": s, "raw": raw, "flag": flag}
    assert avro.decode(avro.encode(value, schema), schema) == value


COMPOSITE_SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": ["null", "string"], "default": None},
        {"name": "score", "type": "double"},
        {
            "name": "tags",
            "type": {"type": "array", "items": "string"},
        },
        {
            "name": "attrs",
            "type": {"type": "map", "values": ["null", "long"]},
        },
        {
            "name": "kind",
            "type": {"type": "enum", "name": "kind_t", "symbols": ["A", "B", "C"]},
        },
        {"name": "sig", "type": {"type": "fixed", "name": "sig_t", "size": 4}},
        {
            "name": "spans",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "span",
                    "fields": [
                        {"name": "start", "type": "int"},
                        {"name": "len", "type": "int"},
                    ],
                },
            },
        },
    ],
}


@settings(max_examples=150, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),
    st.floats(allow_nan=False, allow_infinity=True),
    st.lists(st.text(max_size=10), max_size=5),
    st.dictionaries(
        st.text(max_size=8), st.one_of(st.none(), st.integers(-(2**31), 2**31)),
        max_size=4,
    ),
    st.sampled_from(["A", "B", "C"]),
    st.binary(min_size=4, max_size=4),
    st.lists(
        st.tuples(st.integers(-(2**31), 2**31 - 1), st.integers(0, 2**31 - 1)),
        max_size=4,
    ),
)
def test_fuzz_composite_roundtrip(n, title, score, tags, attrs, kind, sig, spans):
    """Every composite shape of the binary spec — nullable union, array, map
    with union values, enum, fixed, nested record array — survives
    encode→decode bit-exactly (doubles compared by identity, so -0.0 and
    subnormals count)."""
    value = {
        "id": n,
        "title": title,
        "score": score,
        "tags": tags,
        "attrs": attrs,
        "kind": kind,
        "sig": sig,
        "spans": [{"start": a, "len": b} for a, b in spans],
    }
    out = avro.decode(avro.encode(value, COMPOSITE_SCHEMA), COMPOSITE_SCHEMA)
    assert out["id"] == value["id"]
    assert out["title"] == value["title"]
    assert repr(out["score"]) == repr(value["score"])  # exact, incl. -0.0
    assert out["tags"] == value["tags"]
    assert out["attrs"] == value["attrs"]
    assert out["kind"] == value["kind"]
    assert out["sig"] == value["sig"]
    assert out["spans"] == value["spans"]


def test_unknown_type_reference_rejected():
    with pytest.raises(avro.AvroError, match="unknown type"):
        avro.parse_schema({"type": "record", "name": "r",
                           "fields": [{"name": "x", "type": "Missing"}]})


def test_spark_type_derivation():
    t = avro.spark_type_for(avro.parse_schema(COMPLEX_SCHEMA))
    assert t["maybe"].dataType.typeName() == "long"
    assert t["raw"].dataType.typeName() == "binary"
    assert t["tags"].dataType.elementType.typeName() == "string"
    assert t["nested"].dataType["x"].dataType.typeName() == "integer"
    with pytest.raises(avro.AvroError, match="nullable unions"):
        avro.spark_type_for(["int", "string"])


def test_envelope_avro_schema_derives_and_maps():
    env = avro.parse_schema(avro.envelope_avro_schema())
    t = avro.spark_type_for(env)
    assert [f.name for f in t.fields] == [
        "key", "offset", "timestamp", "headers", "value"
    ]
    nested = avro.envelope_avro_schema(value_schema=RECORD_SCHEMA)
    t2 = avro.spark_type_for(avro.parse_schema(nested))
    assert t2["value"].dataType["name"].dataType.typeName() == "string"


def test_decode_avro_column_roundtrip(spark):
    """Converter seam on a DataFrame: encode structs → binary → decode —
    field-exact round-trip including non-UTF-8 bytes and nulls."""
    rows = [
        Row(id=0, payload=Row(name="user-0", n=10, raw=bytes([0xFF, 0x00]))),
        Row(id=1, payload=Row(name="ü-1", n=-1, raw=b"")),
        Row(id=2, payload=None),
    ]
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "value",
            "fields": [
                {"name": "name", "type": "string"},
                {"name": "n", "type": "long"},
                {"name": "raw", "type": "bytes"},
            ],
        }
    )
    df = spark.createDataFrame(
        rows, "id long, payload struct<name:string,n:long,raw:binary>"
    )
    encoded = avro.encode_avro_column(
        df, "payload", schema_json, output_column="value", confluent_schema_id=1
    )
    assert dict(encoded.dtypes)["value"] == "binary"
    decoded = avro.decode_avro_column(
        encoded, "value", schema_json, "decoded", confluent_framing=True
    )
    out = {r["id"]: r["decoded"] for r in decoded.collect()}
    assert out[0]["name"] == "user-0" and out[0]["n"] == 10
    assert bytes(out[0]["raw"]) == bytes([0xFF, 0x00])
    assert out[1]["name"] == "ü-1" and out[1]["n"] == -1
    assert out[2] is None


def test_decode_capture_routes_poison_records_to_dlq(spark):
    """The errors.tolerance=all posture: one corrupt payload among good ones
    survives as a row with null decode and the error text; split_dead_letters
    routes it aside; raise-mode still fails the task on the same batch."""
    from kafka_connector_s3_sink_spark.streaming.pipeline import split_dead_letters

    schema_json = json.dumps(
        {
            "type": "record",
            "name": "value",
            "fields": [{"name": "name", "type": "string"}],
        }
    )
    good = avro.encode({"name": "ok"}, avro.parse_schema(schema_json),
                       confluent_schema_id=1)
    rows = [
        Row(id=0, value=good),
        Row(id=1, value=b"\x00\x00\x00\x00\x01\xff"),  # framed, corrupt body
        Row(id=2, value=b"not avro at all"),           # not even framed
        Row(id=3, value=None),
    ]
    df = spark.createDataFrame(rows, "id long, value binary")

    decoded = avro.decode_avro_column(
        df, "value", schema_json, confluent_framing=True, on_error="capture"
    )
    out = {r["id"]: r for r in decoded.collect()}
    assert len(out) == 4  # full batch survived
    assert out[0]["decoded"]["name"] == "ok" and out[0]["decode_error"] is None
    assert out[1]["decoded"] is None and out[1]["decode_error"]
    assert out[2]["decoded"] is None and "AvroError" in out[2]["decode_error"]
    assert out[3]["decoded"] is None and out[3]["decode_error"] is None  # null ≠ poison

    clean, dlq = split_dead_letters(decoded)
    assert sorted(r["id"] for r in clean.collect()) == [0, 3]
    assert sorted(r["id"] for r in dlq.collect()) == [1, 2]
    assert "decode_error" not in clean.columns and "decode_error" in dlq.columns

    with pytest.raises(Exception):
        avro.decode_avro_column(
            df, "value", schema_json, confluent_framing=True
        ).collect()


def test_long_out_of_int64_range_raises():
    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    with pytest.raises(avro.AvroError, match="64-bit"):
        avro.encode({"x": 1 << 63}, schema)
    with pytest.raises(avro.AvroError, match="64-bit"):
        avro.encode({"x": -(1 << 63) - 1}, schema)
    # boundary values are fine and round-trip
    for v in ((1 << 63) - 1, -(1 << 63)):
        assert avro.decode(avro.encode({"x": v}, schema), schema) == {"x": v}


def test_int_promotes_to_float_double_in_unions():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "score", "type": ["null", "double"]},
            {"name": "ratio", "type": "float"},
        ],
    }
    out = avro.decode(avro.encode({"score": 1, "ratio": 2}, schema), schema)
    assert out == {"score": 1.0, "ratio": 2.0}
    assert isinstance(out["score"], float)
    # bool must NOT promote
    with pytest.raises(avro.AvroError, match="no union branch"):
        avro.encode({"score": True, "ratio": 0.0}, schema)


SCHEMA_V1 = json.dumps(
    {
        "type": "record",
        "name": "event",
        "fields": [{"name": "user", "type": "long"}],
    }
)
SCHEMA_V2 = json.dumps(
    {
        "type": "record",
        "name": "event",
        "fields": [
            {"name": "user", "type": "long"},
            {"name": "k", "type": ["null", "int"]},
        ],
    }
)


def test_decode_confluent_resolves_per_payload_id():
    p1 = avro.encode({"user": 7}, json.loads(SCHEMA_V1), confluent_schema_id=1)
    p2 = avro.encode(
        {"user": 8, "k": 3}, json.loads(SCHEMA_V2), confluent_schema_id=2
    )
    schemas = {1: json.loads(SCHEMA_V1), 2: json.loads(SCHEMA_V2)}
    assert avro.decode_confluent(p1, schemas) == (1, {"user": 7})
    assert avro.decode_confluent(p2, schemas) == (2, {"user": 8, "k": 3})
    with pytest.raises(avro.AvroError, match="not in registry map"):
        avro.decode_confluent(
            avro.encode({"user": 9}, json.loads(SCHEMA_V1), confluent_schema_id=99),
            schemas,
        )


def test_decode_avro_column_with_schema_map(spark):
    """Two writer-schema versions in ONE column: each payload resolves its own
    4-byte id; the output struct is the evolution-merged union of fields
    (v1 payloads leave the newer field NULL); schema_id_column routes."""
    p1 = avro.encode({"user": 7}, json.loads(SCHEMA_V1), confluent_schema_id=1)
    p2 = avro.encode(
        {"user": 8, "k": 3}, json.loads(SCHEMA_V2), confluent_schema_id=2
    )
    df = spark.createDataFrame(
        [Row(event_id=1, value=bytearray(p1)), Row(event_id=2, value=bytearray(p2))]
    )
    out = avro.decode_avro_column(
        df,
        "value",
        {1: SCHEMA_V1, 2: SCHEMA_V2},
        confluent_framing=True,
        schema_id_column="sid",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["decoded"]["user"] == 7 and rows[1]["decoded"]["k"] is None
    assert rows[2]["decoded"]["user"] == 8 and rows[2]["decoded"]["k"] == 3
    assert rows[1]["sid"] == 1 and rows[2]["sid"] == 2


def test_schema_map_requires_framing_and_rejects_conflicts():
    with pytest.raises(avro.AvroError, match="confluent_framing"):
        avro.decode_avro_column(None, "value", {1: SCHEMA_V1})
    conflicting = json.dumps(
        {
            "type": "record",
            "name": "event",
            "fields": [{"name": "user", "type": "string"}],
        }
    )
    with pytest.raises(avro.AvroError, match="conflicting types"):
        avro.decode_avro_column(
            None, "value", {1: SCHEMA_V1, 2: conflicting}, confluent_framing=True
        )


def test_envelope_headers_map_variant():
    """Reference README (357-405) describes envelope headers as an Avro map;
    the default array-of-records shape preserves order + duplicate keys and
    is a documented deviation. The map variant is byte-compatible with the
    reference consumer."""
    default = avro.envelope_avro_schema()
    h_default = next(f for f in default["fields"] if f["name"] == "headers")
    assert h_default["type"][1]["type"] == "array"
    mapped = avro.envelope_avro_schema(headers_as_map=True)
    h_map = next(f for f in mapped["fields"] if f["name"] == "headers")
    assert h_map["type"][1] == {"type": "map", "values": ["null", "bytes"]}
    # the map-shaped envelope round-trips through the codec
    env = {
        "key": b"k",
        "offset": 5,
        "timestamp": 1000,
        "headers": {"h1": b"v1", "h2": None},
        "value": b"payload",
    }
    assert avro.decode(avro.encode(env, mapped), mapped) == env


# ---------------------------------------------------------------------------
# logical types (r6): timestamp-millis/micros, local-timestamp-*, date,
# decimal(bytes/fixed), uuid — the CDC-stream surface


CDC_SCHEMA = json.dumps({
    "type": "record", "name": "txn", "fields": [
        {"name": "id", "type": "long"},
        {"name": "amount",
         "type": {"type": "bytes", "logicalType": "decimal",
                  "precision": 12, "scale": 2}},
        {"name": "fee",
         "type": {"type": "fixed", "name": "fee8", "size": 8,
                  "logicalType": "decimal", "precision": 10, "scale": 4}},
        {"name": "created_at",
         "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "ts_ms",
         "type": ["null",
                  {"type": "long", "logicalType": "timestamp-millis"}]},
        {"name": "local_seen",
         "type": {"type": "long", "logicalType": "local-timestamp-micros"}},
        {"name": "birth_date", "type": {"type": "int", "logicalType": "date"}},
        {"name": "txn_id", "type": {"type": "string", "logicalType": "uuid"}},
        {"name": "t_of_day",
         "type": {"type": "int", "logicalType": "time-millis"}},
    ],
})


def _cdc_value():
    import datetime as dt
    import decimal
    import uuid

    return {
        "id": 7,
        "amount": decimal.Decimal("-12345.67"),
        "fee": decimal.Decimal("3.1400"),
        "created_at": dt.datetime(2024, 3, 1, 12, 34, 56, 123456,
                                  tzinfo=dt.timezone.utc),
        "ts_ms": dt.datetime(2024, 3, 1, 12, 34, 56, 123000,
                             tzinfo=dt.timezone.utc),
        "local_seen": dt.datetime(2024, 3, 1, 9, 0, 0, 42),
        "birth_date": dt.date(1999, 12, 31),
        "txn_id": uuid.UUID("12345678-1234-5678-1234-567812345678"),
        "t_of_day": dt.time(1, 2, 3, 456000),
    }


def test_logical_types_encode_from_typed_values():
    """Typed Python values (Decimal/datetime/date/UUID/time) encode to the
    same bytes as their raw spec representations."""
    schema = avro.parse_schema(CDC_SCHEMA)
    typed = avro.encode(_cdc_value(), schema)
    raw = avro.encode({
        "id": 7,
        "amount": (-1234567).to_bytes(3, "big", signed=True),
        "fee": (31400).to_bytes(8, "big", signed=True),
        "created_at": 1709296496123456,
        "ts_ms": 1709296496123,
        "local_seen": (int((__import__("datetime").datetime(2024, 3, 1, 9, 0, 0, 42)
                            - __import__("datetime").datetime(1970, 1, 1)
                            ).total_seconds() * 1_000_000) + 0),
        "birth_date": 10956,
        "txn_id": "12345678-1234-5678-1234-567812345678",
        "t_of_day": 3723456,
    }, schema)
    assert typed == raw


def test_logical_types_spark_type_derivation():
    from pyspark.sql import types as T

    t = avro.spark_type_for(avro.parse_schema(CDC_SCHEMA))
    by_name = {f.name: f.dataType for f in t.fields}
    assert by_name["amount"] == T.DecimalType(12, 2)
    assert by_name["fee"] == T.DecimalType(10, 4)
    assert by_name["created_at"] == T.TimestampType()
    assert by_name["ts_ms"] == T.TimestampType()
    assert by_name["local_seen"] == T.TimestampNTZType()
    assert by_name["birth_date"] == T.DateType()
    assert by_name["txn_id"] == T.StringType()
    # time-of-day stays a raw int: no silent-corruption cast path
    assert by_name["t_of_day"] == T.IntegerType()


def test_logical_types_decode_column_roundtrip(spark):
    """CDC-shaped fixture through the sink_avro_converter path
    (decode_avro_column with Confluent framing): every logical type lands as
    the PROPER Spark type and value, nullable branch included."""
    import datetime as dt
    import decimal

    schema = avro.parse_schema(CDC_SCHEMA)
    v1 = _cdc_value()
    v2 = dict(v1, id=8, ts_ms=None, amount=decimal.Decimal("0.05"))
    rows = [Row(value=avro.encode(v, schema, confluent_schema_id=21))
            for v in (v1, v2)]
    df = spark.createDataFrame(rows, "value binary")
    out = avro.decode_avro_column(
        df, "value", {21: CDC_SCHEMA}, confluent_framing=True
    )
    got = {r["decoded"]["id"]: r["decoded"] for r in out.collect()}
    d1 = got[7]
    assert d1["amount"] == decimal.Decimal("-12345.67")
    assert d1["fee"] == decimal.Decimal("3.1400")
    # session tz is UTC: the instant round-trips exactly
    assert d1["created_at"] == dt.datetime(2024, 3, 1, 12, 34, 56, 123456)
    assert d1["ts_ms"] == dt.datetime(2024, 3, 1, 12, 34, 56, 123000)
    assert d1["local_seen"] == dt.datetime(2024, 3, 1, 9, 0, 0, 42)
    assert d1["birth_date"] == dt.date(1999, 12, 31)
    assert d1["txn_id"] == "12345678-1234-5678-1234-567812345678"
    assert d1["t_of_day"] == 3723456
    d2 = got[8]
    assert d2["ts_ms"] is None and d2["amount"] == decimal.Decimal("0.05")


def test_decimal_scale_mismatch_raises():
    import decimal

    schema = avro.parse_schema(json.dumps(
        {"type": "bytes", "logicalType": "decimal",
         "precision": 10, "scale": 2}))
    with pytest.raises(avro.AvroError, match="scale"):
        avro.encode(decimal.Decimal("1.234"), schema)


@settings(max_examples=80, deadline=None)
@given(
    unscaled=st.integers(min_value=-(10**17), max_value=10**17),
    scale=st.integers(min_value=0, max_value=6),
    micros=st.integers(min_value=0, max_value=4_102_444_800_000_000),  # ~2100
    days=st.integers(min_value=-100_000, max_value=100_000),
)
def test_fuzz_logical_type_roundtrip(unscaled, scale, micros, days):
    """Typed encode → binary → decode → JSON-bridge conversion is exact for
    arbitrary decimals (bytes and fixed), timestamps, and dates."""
    import datetime as dt
    import decimal

    value = decimal.Decimal(unscaled).scaleb(-scale)
    schema = avro.parse_schema(json.dumps({
        "type": "record", "name": "r", "fields": [
            {"name": "d", "type": {"type": "bytes", "logicalType": "decimal",
                                   "precision": 20, "scale": scale}},
            {"name": "df", "type": {"type": "fixed", "name": "f16",
                                    "size": 16, "logicalType": "decimal",
                                    "precision": 20, "scale": scale}},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        ],
    }))
    ts = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        microseconds=micros
    )
    day = dt.date(1970, 1, 1) + dt.timedelta(days=days)
    payload = avro.encode({"d": value, "df": value, "ts": ts, "day": day}, schema)
    decoded = avro.decode(payload, schema)
    names = avro._registry(schema)
    bridged = avro._jsonable(decoded, schema, names)
    assert decimal.Decimal(bridged["d"]) == value
    assert decimal.Decimal(bridged["df"]) == value
    # bridge strings parse back to the exact instant/date
    assert bridged["ts"] == ts.replace(tzinfo=None).isoformat(
        sep="T", timespec="microseconds") + "Z"
    assert bridged["day"] == day.isoformat()
    # raw-value encode produces identical bytes (typed path adds nothing)
    raw_fixed = unscaled.to_bytes(16, "big", signed=True)
    nbytes = max(1, (unscaled.bit_length() + 8) // 8)
    raw = avro.encode({
        "d": unscaled.to_bytes(nbytes, "big", signed=True),
        "df": raw_fixed, "ts": micros, "day": days,
    }, schema)
    assert raw == payload
