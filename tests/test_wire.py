"""Golden tests for the AMQP event wire format — the port of the
reference's published-message assertions (data_updater_test.exs:119-152:
headers dict + decoded SimpleEvent struct for a device_connected
event), plus roundtrip coverage of every event type the oneof carries."""

from __future__ import annotations

import uuid

from astarte_data_updater_plant_spark.streaming.wire import (
    PARENT_TRIGGER_ID,
    decode_call,
    decode_reply,
    decode_simple_event,
    encode_delete_volatile_trigger_call,
    encode_generic_error_reply,
    encode_generic_ok_reply,
    encode_install_volatile_trigger_call,
    encode_simple_event,
    events_wire_table,
    rpc_call_to_message,
    simple_event_headers,
    trigger_uuid,
)

REALM = "autotestrealm"
DEVICE = "f0VMRgIBAQAAAAAAAAAAAA"


def test_device_connected_golden():
    # data_updater_test.exs:116-152: timestamp_us_x_10 for
    # 2017-10-09T14:00:32Z, SimpleEvent.timestamp in milliseconds
    timestamp_ms = 1507557632000
    stid = trigger_uuid("device_connected_trigger")
    payload = encode_simple_event(
        "device_connected",
        {"ip_address": "10.0.0.1"},
        realm=REALM,
        device_id=DEVICE,
        timestamp_ms=timestamp_ms,
        simple_trigger_id=stid,
        parent_trigger_id=PARENT_TRIGGER_ID,
    )
    headers = dict(
        simple_event_headers(REALM, DEVICE, stid, PARENT_TRIGGER_ID, "device_connected")
    )
    # header assertions (data_updater_test.exs:128-137)
    assert headers["x_astarte_event_type"] == "device_connected_event"
    assert headers["x_astarte_realm"] == REALM
    assert headers["x_astarte_device_id"] == DEVICE
    assert uuid.UUID(headers["x_astarte_simple_trigger_id"]).bytes == stid
    assert uuid.UUID(headers["x_astarte_parent_trigger_id"]).bytes == PARENT_TRIGGER_ID
    # payload assertions (data_updater_test.exs:139-152)
    decoded = decode_simple_event(payload)
    assert decoded == {
        "simple_trigger_id": stid,
        "parent_trigger_id": PARENT_TRIGGER_ID,
        "realm": REALM,
        "device_id": DEVICE,
        "timestamp": timestamp_ms,
        "version": 1,
        "event": ("device_connected", {"ip_address": "10.0.0.1"}),
    }


def test_roundtrip_every_event_type():
    cases = {
        "device_disconnected": {},
        "incoming_data": {"interface": "com.test.S", "path": "/0/v", "value": 5},
        "value_change": {
            "interface": "com.test.L", "path": "/time/from",
            "old_value": 10, "new_value": 20,
        },
        "value_change_applied": {
            "interface": "com.test.L", "path": "/time/from",
            "old_value": 10, "new_value": 20,
        },
        "path_created": {"interface": "com.test.L", "path": "/t", "value": 1.5},
        "path_removed": {"interface": "com.test.L", "path": "/t"},
        "value_stored": {"interface": "com.test.S", "path": "/0/v", "value": "x"},
        "incoming_introspection": {"introspection": "com.test.L:1:0;com.test.S:1:0"},
        "interface_added": {"interface": "com.test.L", "major": 1, "minor": 0},
        "interface_removed": {"interface": "com.test.L", "major": 1},
        "interface_minor_updated": {
            "interface": "com.test.L", "major": 1,
            "old_minor": 0, "new_minor": 2,
        },
    }
    for et, row in cases.items():
        buf = encode_simple_event(
            et, row,
            realm=REALM, device_id=DEVICE, timestamp_ms=1,
            simple_trigger_id=trigger_uuid("t"), parent_trigger_id=PARENT_TRIGGER_ID,
        )
        name, ev = decode_simple_event(buf)["event"]
        assert name == et
        assert ev == row, et


def test_rpc_call_roundtrip():
    import json

    stid = trigger_uuid("vt1")
    spec = json.dumps({
        "interface": "com.test.SimpleStreamTest", "path": "/0/value",
        "op": "GREATER_THAN", "known_value": 10,
    }).encode()
    buf = encode_install_volatile_trigger_call(
        realm_name=REALM, device_id=DEVICE,
        object_id=b"\x01" * 16, object_type=2, parent_id=PARENT_TRIGGER_ID,
        simple_trigger_id=stid, simple_trigger=spec, trigger_target=b"amqp:t",
    )
    name, f = decode_call(buf)
    assert name == "install_volatile_trigger"
    assert f == {
        "realm_name": REALM, "device_id": DEVICE,
        "object_id": b"\x01" * 16, "object_type": 2,
        "parent_id": PARENT_TRIGGER_ID, "simple_trigger_id": stid,
        "simple_trigger": spec, "trigger_target": b"amqp:t",
    }

    dbuf = encode_delete_volatile_trigger_call(
        realm_name=REALM, device_id=DEVICE, trigger_id=stid
    )
    name, f = decode_call(dbuf)
    assert name == "delete_volatile_trigger"
    assert f == {"realm_name": REALM, "device_id": DEVICE, "trigger_id": stid}

    import pytest as _pytest

    with _pytest.raises(ValueError):  # handler.ex:40-43 rejects empty calls
        decode_call(b"")


def test_rpc_reply_roundtrip():
    assert decode_reply(encode_generic_ok_reply()) == {"ok": True}
    err = decode_reply(
        encode_generic_error_reply(
            "device_not_found", user_readable_message="no such device"
        )
    )
    assert err == {
        "ok": False,
        "error_name": "device_not_found",
        "user_readable_message": "no such device",
    }


def test_rpc_drives_state_machine():
    """Decoded Call messages run the existing install/fire/delete path
    (data_updater.ex:97-121: RPC lands on the same per-device serial
    queue as data)."""
    import json
    import uuid as _uuid
    from datetime import datetime, timedelta

    from astarte_data_updater_plant_spark.catalog import fixture_interfaces
    from astarte_data_updater_plant_spark.functions.payloads import encode_document
    from astarte_data_updater_plant_spark.streaming.state_machine import (
        Catalog,
        DeviceState,
        process_device_messages,
    )

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    stid = trigger_uuid("vt-rpc")
    tid_str = str(_uuid.UUID(bytes=stid))
    spec = json.dumps({
        "interface": "com.test.SimpleStreamTest", "path": "/0/value",
        "op": "GREATER_THAN", "known_value": 10,
    }).encode()
    install = rpc_call_to_message(
        encode_install_volatile_trigger_call(
            realm_name=REALM, device_id=DEVICE, simple_trigger_id=stid,
            simple_trigger=spec, trigger_target=b"t",
        ),
        message_id="rpc-1", timestamp=t0 + timedelta(seconds=1),
    )
    delete = rpc_call_to_message(
        encode_delete_volatile_trigger_call(
            realm_name=REALM, device_id=DEVICE, trigger_id=stid
        ),
        message_id="rpc-2", timestamp=t0 + timedelta(seconds=3),
    )
    base = dict(realm=REALM, device_id=DEVICE, interface=None, path=None,
                ip_address=None)
    intro = dict(base, message_id="i0", reception_timestamp=t0,
                 msg_type="introspection",
                 payload=b"com.test.SimpleStreamTest:1:0")
    data = dict(base, message_id="d1",
                reception_timestamp=t0 + timedelta(seconds=2),
                msg_type="data", interface="com.test.SimpleStreamTest",
                path="/0/value", payload=encode_document({"v": 42}))
    state = DeviceState(realm=REALM, device_id=DEVICE)
    out = process_device_messages(
        state, Catalog(fixture_interfaces()), [intro, install, data, delete]
    )
    evs = [e["event_type"] for e in out.events]
    assert evs.count("volatile_trigger_installed") == 1
    fired = [e for e in out.events if e["event_type"] == "volatile_trigger_fired"]
    assert len(fired) == 1 and fired[0]["value"] == tid_str
    assert evs.count("volatile_trigger_deleted") == 1
    assert state.volatile_triggers == {}


def test_events_wire_table(spark):
    from datetime import datetime

    import pyspark.sql.types as T

    ev_schema = T.StructType(
        [
            T.StructField("realm", T.StringType()),
            T.StructField("device_id", T.StringType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("interface", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("old_value", T.StringType()),
            T.StructField("new_value", T.StringType()),
            T.StructField("ip_address", T.StringType()),
            T.StructField("introspection", T.StringType()),
            T.StructField("typed_json", T.StringType()),
        ]
    )
    events = spark.createDataFrame(
        [
            (REALM, DEVICE, "device_connected", datetime(2017, 10, 9, 14, 0, 32),
             None, None, None, None, None, "10.0.0.1", None,
             '{"ip_address": "10.0.0.1"}'),
            (REALM, DEVICE, "value_stored", datetime(2017, 10, 9, 14, 0, 33),
             "com.test.S", "/0/v", "5", None, None, None, None,
             '{"value": 5}'),
        ],
        ev_schema,
    )
    targets = spark.createDataFrame(
        [("t_conn", "device_connected", "events.connected"),
         ("t_any", "*", "events.all")],
        "trigger_id string, t_event_type string, routing_key string",
    )
    rows = events_wire_table(events, targets).collect()
    # 2 events x (1 specific-or-none + wildcard): conn matches both
    # targets, value_stored only the wildcard
    assert len(rows) == 3
    by_key = {}
    for r in rows:
        by_key.setdefault(r.routing_key, []).append(r)
    assert set(by_key) == {"events.connected", "events.all"}
    conn = by_key["events.connected"][0]
    assert conn.headers["x_astarte_event_type"] == "device_connected_event"
    assert conn.headers["x_astarte_realm"] == REALM
    decoded = decode_simple_event(bytes(conn.payload))
    assert decoded["event"] == ("device_connected", {"ip_address": "10.0.0.1"})
    assert decoded["timestamp"] == 1507557632000
    stored = [r for r in by_key["events.all"]
              if r.headers["x_astarte_event_type"] == "value_stored_event"][0]
    ev = decode_simple_event(bytes(stored.payload))["event"][1]
    # typed_json wins over the string-cast column: the wire value is the
    # INTEGER 5 (the reference's typed Cyanide BSON), not the string "5"
    assert ev == {"interface": "com.test.S", "path": "/0/v", "value": 5}


def test_negative_timestamp_and_int_fields():
    # pre-epoch timestamps / negative ints must encode as protobuf's
    # 10-byte two's-complement varint, not hang the encoder
    buf = encode_simple_event(
        "interface_minor_updated",
        {"interface": "com.test.L", "major": 1, "old_minor": -1, "new_minor": 2},
        realm=REALM, device_id=DEVICE, timestamp_ms=-86400000,
        simple_trigger_id=trigger_uuid("t"), parent_trigger_id=PARENT_TRIGGER_ID,
    )
    decoded = decode_simple_event(buf)
    assert decoded["timestamp"] == -86400000
    assert decoded["event"][1]["old_minor"] == -1
