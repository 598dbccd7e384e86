"""Golden-vector tests for payload decode, ported from the reference's
payloads_decoder_test.exs style (unit, exhaustive edge cases)."""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

from astarte_data_updater_plant_spark.functions.payloads import (
    MAX_INFLATED_SIZE,
    decode_bson_payload,
    encode_document,
    parse_introspection,
    safe_inflate,
)


def test_simple_value_roundtrip():
    for v in (5, 2**40, 1.25, "ciao", True, False, b"\x01\x02"):
        payload = encode_document({"v": v})
        d = decode_bson_payload(payload)
        assert d.value == v
        assert d.timestamp_ms is None


def test_timestamp_and_metadata():
    ts = datetime(2017, 9, 30, 7, 10, 0, tzinfo=timezone.utc)
    payload = encode_document({"v": 1, "t": ts, "m": {"k": "x"}})
    d = decode_bson_payload(payload)
    assert d.value == 1
    assert d.timestamp_ms == int(ts.timestamp() * 1000)
    assert d.metadata == {"k": "x"}


def test_empty_payload_is_unset():
    assert decode_bson_payload(b"").value is None


def test_empty_binary_value_is_unset():
    # payloads_decoder.ex:43-44
    d = decode_bson_payload(encode_document({"v": b""}))
    assert d.value is None


def test_object_aggregation_value():
    d = decode_bson_payload(encode_document({"v": {"string": "aaa", "value": 1.1}}))
    assert d.value == {"string": "aaa", "value": 1.1}


def test_deprecated_bare_document_format():
    # payloads_decoder.ex:56-58: doc without `v` = old-format object
    d = decode_bson_payload(encode_document({"string": "aaa", "value": 2.2}))
    assert d.value == {"string": "aaa", "value": 2.2}


def test_array_value():
    d = decode_bson_payload(encode_document({"v": [1, 2, 3]}))
    assert d.value == [1, 2, 3]


def test_datetime_value():
    ts = datetime(2024, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    d = decode_bson_payload(encode_document({"v": ts}))
    assert d.value == ts


def test_safe_inflate_roundtrip():
    data = b"com.test.LCDMonitor/time/from;com.test.LCDMonitor/time/to"
    assert safe_inflate(zlib.compress(data)) == data


def test_safe_inflate_rejects_bomb():
    bomb = zlib.compress(b"\x00" * (MAX_INFLATED_SIZE + 1))
    assert safe_inflate(bomb) is None


def test_safe_inflate_rejects_garbage():
    assert safe_inflate(b"not zlib data") is None


def test_introspection_parse_ok():
    # payloads_decoder_test style vector
    s = "com.test.LCDMonitor:1:0;com.test.SimpleStreamTest:1:0"
    assert parse_introspection(s) == [
        ("com.test.LCDMonitor", 1, 0),
        ("com.test.SimpleStreamTest", 1, 0),
    ]


def test_introspection_parse_empty():
    assert parse_introspection("") == []


def test_introspection_parse_malformed():
    assert parse_introspection("com.test.LCDMonitor:1") is None
    assert parse_introspection("com.test.LCDMonitor:a:0") is None
    assert parse_introspection(";;") is None
    assert parse_introspection("com.test.LCDMonitor:-1:0") is None
