"""Simple-flow scenario against the pure state machine — the port of
the reference's end-to-end integration test assertions
(data_updater_test.exs:51-947), minus the broker/DB round-trips."""

from __future__ import annotations

from astarte_data_updater_plant_spark.catalog import fixture_interfaces
from astarte_data_updater_plant_spark.streaming.state_machine import (
    Catalog,
    DeviceState,
    process_device_messages,
)

from .fixtures_flow import DEVICE, REALM, simple_flow_messages


def run_flow():
    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    out = process_device_messages(state, catalog, simple_flow_messages())
    return state, out


def test_connection_lifecycle():
    state, out = run_flow()
    assert state.connected is False  # disconnected at the end
    assert state.last_seen_ip == "10.0.0.1"
    events = [e["event_type"] for e in out.events]
    assert events[0] == "device_connected"
    assert events[-1] == "device_disconnected"


def test_introspection_events():
    _, out = run_flow()
    added = [e for e in out.events if e["event_type"] == "interface_added"]
    assert {e["interface"] for e in added} == {
        "com.test.LCDMonitor",
        "com.test.SimpleStreamTest",
        "com.example.TestObject",
    }
    intro = [e for e in out.events if e["event_type"] == "incoming_introspection"]
    assert len(intro) == 1 and "com.test.LCDMonitor:1:0" in intro[0]["introspection"]


def test_property_change_detection():
    _, out = run_flow()
    changes = [e for e in out.events if e["event_type"] == "value_change"]
    assert len(changes) == 1
    assert changes[0]["path"] == "/time/from"
    assert changes[0]["old_value"] == 10 and changes[0]["new_value"] == 20
    created = {e["path"] for e in out.events if e["event_type"] == "path_created"}
    assert created == {"/time/from", "/weekSchedule/2/start", "/lcdCommand"}


def test_property_state_after_prune_and_unset():
    state, out = run_flow()
    # prune removed /lcdCommand; unset removed /time/from
    assert ("com.test.LCDMonitor", "/weekSchedule/2/start") in state.properties
    assert ("com.test.LCDMonitor", "/lcdCommand") not in state.properties
    assert ("com.test.LCDMonitor", "/time/from") not in state.properties
    removed = {e["path"] for e in out.events if e["event_type"] == "path_removed"}
    assert removed == {"/lcdCommand", "/time/from"}
    deleted = {d["path"] for d in out.property_deletes}
    assert deleted == {"/lcdCommand", "/time/from"}


def test_datastream_rows_and_dedup():
    _, out = run_flow()
    ds = [r for r in out.datastream_rows]
    # m07 redelivery is deduped: exactly 2 rows for /0/value
    assert len(ds) == 2
    assert [r["integer_value"] for r in ds] == [5, 6]
    assert all(r["interface"] == "com.test.SimpleStreamTest" for r in ds)


def test_object_rows_tombstone_avoidance():
    _, out = run_flow()
    assert len(out.object_rows) == 2
    full, partial = out.object_rows
    assert full["v_string"] == "aaa" and full["v_value"] == 1.1
    # absent key -> column absent from the row (never written as NULL)
    assert partial["v_string"] == "bbb" and "v_value" not in partial


def test_counters():
    state, _ = run_flow()
    # counted: introspection + 8 data messages (m03-m10) + m13 unset;
    # NOT counted: m11 (fails path validation before decode), dedup'd
    # m07 redelivery, control/connection/disconnection
    assert state.total_received_msgs == 10
    key = ("com.test.SimpleStreamTest", 1)
    assert state.interface_msgs[key] == 2
    assert state.interface_bytes[key] > 0


def test_error_side_channel():
    _, out = run_flow()
    errs = {e["error"] for e in out.errors}
    assert "invalid_path" in errs
    # unset on allow_unset=true mapping produces no unset error
    assert "unset_not_allowed" not in errs


def test_unknown_interface_rejected():
    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    from astarte_data_updater_plant_spark.functions.payloads import encode_document
    from datetime import datetime, timezone

    msgs = [
        dict(message_id="x1", reception_timestamp=datetime(2020, 1, 1, tzinfo=timezone.utc),
             realm=REALM, device_id=DEVICE, msg_type="data",
             interface="org.unknown.Iface", path="/a", payload=encode_document({"v": 1}),
             ip_address=None),
    ]
    out = process_device_messages(state, catalog, msgs)
    assert out.errors[0]["error"] == "interface_not_in_introspection"
    assert not out.datastream_rows


def test_type_validation():
    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    from astarte_data_updater_plant_spark.functions.payloads import encode_document
    from datetime import datetime, timezone

    base = dict(realm=REALM, device_id=DEVICE, ip_address=None)
    ts = datetime(2020, 1, 1, tzinfo=timezone.utc)
    msgs = [
        dict(base, message_id="i1", reception_timestamp=ts, msg_type="introspection",
             interface=None, path=None,
             payload=b"com.test.SimpleStreamTest:1:0"),
        # string where integer expected -> unexpected_value_type
        dict(base, message_id="i2", reception_timestamp=ts, msg_type="data",
             interface="com.test.SimpleStreamTest", path="/0/value",
             payload=encode_document({"v": "not an int"})),
    ]
    out = process_device_messages(state, catalog, msgs)
    assert any(e["error"] == "unexpected_value_type" for e in out.errors)
    assert not out.datastream_rows


def _vt_msgs(trigger_payloads_then_data):
    """Build an introspection + given messages list."""
    from datetime import datetime, timedelta, timezone

    base = dict(realm=REALM, device_id=DEVICE, ip_address=None)
    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
    msgs = [
        dict(base, message_id="vt-i", reception_timestamp=t0,
             msg_type="introspection", interface=None, path=None,
             payload=b"com.test.SimpleStreamTest:1:0;com.test.LCDMonitor:1:3;"
                     b"com.example.TestObject:1:0"),
    ]
    for i, m in enumerate(trigger_payloads_then_data):
        msgs.append(
            dict(base, message_id=f"vt-{i}",
                 reception_timestamp=t0 + timedelta(seconds=i + 1), **m)
        )
    return msgs


def test_volatile_trigger_lifecycle():
    import json

    from astarte_data_updater_plant_spark.functions.payloads import encode_document

    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    install = json.dumps({
        "trigger_id": "vt1", "interface": "com.test.SimpleStreamTest",
        "path": "/0/value", "op": "GREATER_THAN", "known_value": 10,
    }).encode()
    msgs = _vt_msgs([
        dict(msg_type="install_volatile_trigger", interface=None, path=None,
             payload=install),
        # fires: 42 > 10
        dict(msg_type="data", interface="com.test.SimpleStreamTest",
             path="/0/value", payload=encode_document({"v": 42})),
        # does not fire: 5 <= 10
        dict(msg_type="data", interface="com.test.SimpleStreamTest",
             path="/0/value", payload=encode_document({"v": 5})),
        dict(msg_type="delete_volatile_trigger", interface=None, path=None,
             payload=json.dumps({"trigger_id": "vt1"}).encode()),
        # deleted: no fire even though it matches
        dict(msg_type="data", interface="com.test.SimpleStreamTest",
             path="/0/value", payload=encode_document({"v": 99})),
    ])
    out = process_device_messages(state, catalog, msgs)
    evs = [e["event_type"] for e in out.events]
    assert evs.count("volatile_trigger_installed") == 1
    assert evs.count("volatile_trigger_deleted") == 1
    fired = [e for e in out.events if e["event_type"] == "volatile_trigger_fired"]
    assert len(fired) == 1
    assert fired[0]["value"] == "vt1" and fired[0]["new_value"] == 42
    assert state.volatile_triggers == {}


def test_volatile_trigger_install_validation():
    import json

    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())

    def inst(spec):
        return dict(msg_type="install_volatile_trigger", interface=None,
                    path=None, payload=json.dumps(spec).encode())

    msgs = _vt_msgs([
        inst({"trigger_id": "bad1", "interface": "org.nope.Iface", "path": "/x"}),
        inst({"trigger_id": "bad2", "interface": "com.test.SimpleStreamTest",
              "path": "/not/a/real/endpoint"}),
        # object-aggregated interfaces are rejected (impl.ex:976-980)
        inst({"trigger_id": "bad3", "interface": "com.example.TestObject",
              "path": "/string"}),
        # parametric endpoint pattern is a valid match path
        inst({"trigger_id": "ok1", "interface": "com.test.LCDMonitor",
              "path": "/weekSchedule/%{day}/start", "op": "ANY"}),
    ])
    out = process_device_messages(state, catalog, msgs)
    errs = [e["error"] for e in out.errors]
    assert errs.count("interface_not_in_introspection") == 1
    assert errs.count("invalid_match_path") == 2
    assert list(state.volatile_triggers) == ["ok1"]


def test_error_asks_clean_session():
    from datetime import datetime, timezone

    from astarte_data_updater_plant_spark.functions.payloads import encode_document

    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    ts = datetime(2020, 1, 1, tzinfo=timezone.utc)
    base = dict(realm=REALM, device_id=DEVICE, ip_address=None)
    msgs = [
        dict(base, message_id="c1", reception_timestamp=ts, msg_type="data",
             interface="org.unknown.Iface", path="/a",
             payload=encode_document({"v": 1})),
    ]
    out = process_device_messages(state, catalog, msgs)
    assert [c["command"] for c in out.commands] == ["clean_session"]
    assert state.pending_empty_cache is True
    # device answers /emptyCache -> flag cleared (impl.ex:930)
    out2 = process_device_messages(state, catalog, [
        dict(base, message_id="c2", reception_timestamp=ts, msg_type="control",
             interface=None, path="/emptyCache", payload=b""),
    ])
    assert state.pending_empty_cache is False
    # ...and asks the sink to resend the stored server-owned
    # properties (impl.ex:921-935)
    assert [c["command"] for c in out2.commands] == ["resend_properties"]


def test_empty_prune_payload_prunes_all_properties():
    # the reference's dedicated <<0,0,0,0>> clause (impl.ex:866-889):
    # a 4-byte size header with no zlib body prunes EVERY stored
    # device-owned property
    from datetime import datetime, timedelta, timezone

    from astarte_data_updater_plant_spark.functions.payloads import encode_document

    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
    base = dict(realm=REALM, device_id=DEVICE, ip_address=None)
    out = process_device_messages(state, catalog, [
        dict(base, message_id="p0", reception_timestamp=t0,
             msg_type="introspection", interface=None, path=None,
             payload=b"com.test.LCDMonitor:1:0"),
        dict(base, message_id="p1", reception_timestamp=t0 + timedelta(seconds=1),
             msg_type="data", interface="com.test.LCDMonitor",
             path="/time/from", payload=encode_document({"v": 10})),
        dict(base, message_id="p2", reception_timestamp=t0 + timedelta(seconds=2),
             msg_type="control", interface=None,
             path="/producer/properties", payload=b"\x00\x00\x00\x00"),
    ])
    assert state.properties == {}
    assert {d["path"] for d in out.property_deletes} == {"/time/from"}


def test_interface_major_bump_tracks_old_introspection():
    from datetime import datetime, timedelta, timezone

    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
    base = dict(realm=REALM, device_id=DEVICE, ip_address=None,
                interface=None, path=None)
    out = process_device_messages(state, catalog, [
        dict(base, message_id="o1", reception_timestamp=t0,
             msg_type="introspection", payload=b"com.test.LCDMonitor:1:3"),
        dict(base, message_id="o2", reception_timestamp=t0 + timedelta(seconds=1),
             msg_type="introspection", payload=b"com.test.LCDMonitor:2:0"),
    ])
    evs = [(e["event_type"], e["interface"], e["value"]) for e in out.events
           if e["event_type"] in ("interface_added", "interface_removed")]
    assert ("interface_added", "com.test.LCDMonitor",
            {"major_version": 1, "minor_version": 3}) in evs
    assert ("interface_removed", "com.test.LCDMonitor",
            {"major_version": 1}) in evs
    assert ("interface_added", "com.test.LCDMonitor",
            {"major_version": 2, "minor_version": 0}) in evs
    # the dropped (name, major) parks its minor (impl.ex:826-834)
    assert state.old_introspection == {("com.test.LCDMonitor", 1): 3}
    # re-announcing v1 clears the parked entry
    process_device_messages(state, catalog, [
        dict(base, message_id="o3", reception_timestamp=t0 + timedelta(seconds=2),
             msg_type="introspection", payload=b"com.test.LCDMonitor:1:3"),
    ])
    assert state.old_introspection == {("com.test.LCDMonitor", 2): 0}


def test_minor_only_update_fires_nothing():
    from datetime import datetime, timedelta, timezone

    state = DeviceState(realm=REALM, device_id=DEVICE)
    catalog = Catalog(fixture_interfaces())
    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
    base = dict(realm=REALM, device_id=DEVICE, ip_address=None,
                interface=None, path=None)
    out = process_device_messages(state, catalog, [
        dict(base, message_id="n1", reception_timestamp=t0,
             msg_type="introspection", payload=b"com.test.LCDMonitor:1:3"),
        dict(base, message_id="n2", reception_timestamp=t0 + timedelta(seconds=1),
             msg_type="introspection", payload=b"com.test.LCDMonitor:1:4"),
    ])
    evs = [e["event_type"] for e in out.events]
    assert evs.count("interface_added") == 1  # only the first announce
    assert evs.count("interface_removed") == 0
    assert state.introspection == {"com.test.LCDMonitor": (1, 4)}

def test_effective_retention_cap_combinator():
    # analytics-only combinator (q100's effective-TTL view); the ingest
    # path applies the cap alone — see the tests below
    from astarte_data_updater_plant_spark.streaming.state_machine import (
        effective_retention_s,
    )

    assert effective_retention_s(None, None) is None
    assert effective_retention_s(3600, None) == 3600
    assert effective_retention_s(None, 7200) == 7200
    assert effective_retention_s(86400, 7200) == 7200  # realm cap wins
    assert effective_retention_s(3600, 7200) == 3600   # mapping under cap


def test_path_ttl_matches_reference():
    # impl.ex:527-533: retention * 2 + div(retention, 2), nil -> nil
    from astarte_data_updater_plant_spark.streaming.state_machine import path_ttl_s

    assert path_ttl_s(None) is None
    assert path_ttl_s(7200) == 18000
    assert path_ttl_s(7201) == 7201 * 2 + 7201 // 2  # integer div like Elixir's


def test_realm_retention_cap_sets_datastream_expiry():
    from datetime import timedelta

    # with the realm cap set, every datastream insert gets
    # expires_at = reception + cap — the cap ALONE, mapping expiry is
    # never consulted (impl.ex:438) — and the path registry entry gets
    # 2.5x the cap (impl.ex:414,527-533)
    state = DeviceState(realm=REALM, device_id=DEVICE, max_retention_s=7200)
    catalog = Catalog(fixture_interfaces())
    out = process_device_messages(state, catalog, simple_flow_messages())
    ds = out.datastream_rows
    assert len(ds) == 2
    for r in ds:
        assert r["expires_at"] == r["reception_timestamp"] + timedelta(seconds=7200)
    reg = [u for u in out.property_upserts if u.get("is_path_registry")]
    assert reg, "datastream flow must register its path"
    for u in reg:
        assert u["expires_at"] == u["reception_timestamp"] + timedelta(
            seconds=int(7200 * 2.5)
        )
    # the cap applies to object-aggregated inserts too (same
    # insert_value_into_db call, impl.ex:438)
    assert out.object_rows
    for r in out.object_rows:
        assert r["expires_at"] == r["reception_timestamp"] + timedelta(seconds=7200)

    # without the cap the same flow leaves expiry unset everywhere
    _, out2 = run_flow()
    assert all(r.get("expires_at") is None for r in out2.datastream_rows)
    assert all(r.get("expires_at") is None for r in out2.object_rows)
