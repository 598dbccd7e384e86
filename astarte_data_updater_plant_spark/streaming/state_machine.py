"""Per-device keyed state machine — the reference's device GenServer.

The reference runs one Erlang process per (realm, device) holding a
``%State{}`` (``data_updater/state.ex:19-45``) and processes messages
strictly in order (``message_tracker/server.ex``). In Spark the same
semantics become a keyed-state function: group the message stream by
(realm, device_id), sort each group by (reception_timestamp,
message_id), fold the pure transition function over it.

``process_message`` is deliberately pure Python over plain dicts so
that (a) unit tests exercise the exact semantics without a JVM, and
(b) both execution modes share it:

- batch reprocessing: ``groupBy(key).applyInPandas`` (pipeline.py)
- streaming: ``groupBy(key).applyInPandasWithState`` with the state
  serialized into the GroupState tuple (pipeline.py)

Semantics ported (reference file:line in each handler):
- message dedup on message_id          message_tracker/server.ex:45-159
- connect / disconnect lifecycle       impl.ex:89-164
- data-path validation ladder          impl.ex:311-525
- property upsert/unset + change events impl.ex:233-309, queries.ex:87-155
- object aggregation w/ unknown-key skip queries.ex:199-297
- path registry gate w/ TTL            impl.ex:386-416,527-557
- counters (total + per interface)     impl.ex:623-674
- introspection diff -> add/remove     impl.ex:688-864
- property prune (alive-set anti set)  impl.ex:1334-1411
- empty cache control                  impl.ex:866-944
- error side-channel                   impl.ex:463-524
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any

from ..catalog import (
    Aggregation,
    Interface,
    InterfaceType,
    Ownership,
    object_column_name,
    object_table_name,
)
from ..functions.matchers import py_value_match
from ..functions.payloads import (
    decode_bson_payload,
    parse_introspection,
    safe_inflate,
)
from ..types import ValueType, db_column_name, python_value_type

#: clock tolerance when judging an existing registry entry (impl.ex:535-557)
PATH_TTL_TOLERANCE_S = 3600
#: per-device paths cache size (impl.ex:46, cache.ex:24-40)
PATHS_CACHE_SIZE = 32


@dataclass
class DeviceState:
    """Spark-side mirror of %State{} (data_updater/state.ex:19-45)."""

    realm: str
    device_id: str
    connected: bool = False
    introspection: dict[str, tuple[int, int]] = field(default_factory=dict)
    #: (name, major) -> minor for interfaces removed or major-bumped
    #: (impl.ex:826-834, queries.ex:561-597)
    old_introspection: dict[tuple[str, int], int] = field(default_factory=dict)
    total_received_msgs: int = 0
    total_received_bytes: int = 0
    interface_msgs: dict[tuple[str, int], int] = field(default_factory=dict)
    interface_bytes: dict[tuple[str, int], int] = field(default_factory=dict)
    properties: dict[tuple[str, str], Any] = field(default_factory=dict)
    paths_cache: dict[tuple[str, str], datetime] = field(default_factory=dict)
    #: trigger_id -> {interface, path, op, known_value}
    #: (impl.ex:946-1058 install, :1060-1189 delete)
    volatile_triggers: dict[str, dict] = field(default_factory=dict)
    #: insertion-ordered dedup window — a dict, not a list: membership
    #: is checked per MESSAGE, and a 4096-entry list scan is O(n) per
    #: check (O(n^2) per window at scale); dict keys keep insertion
    #: order, so trimming the oldest half stays exact
    seen_message_ids: dict[str, None] = field(default_factory=dict)
    pending_empty_cache: bool = False
    last_seen_ip: str | None = None
    last_connection: datetime | None = None
    last_disconnection: datetime | None = None
    #: realm-wide datastream_maximum_storage_retention (state.ex:43),
    #: loaded once from kv_store realm_config (queries.ex:745-772) and
    #: applied as the TTL cap on every datastream insert (impl.ex:427-438)
    max_retention_s: int | None = None


@dataclass
class Outputs:
    """Side-outputs of one message (the reference's Cassandra writes,
    AMQP events, device commands and discards)."""

    datastream_rows: list[dict] = field(default_factory=list)
    property_upserts: list[dict] = field(default_factory=list)
    property_deletes: list[dict] = field(default_factory=list)
    object_rows: list[dict] = field(default_factory=list)
    events: list[dict] = field(default_factory=list)
    errors: list[dict] = field(default_factory=list)
    #: log-only conditions (reference Logger.warn with no discard /
    #: clean-session ask, e.g. unset on allow_unset=false queries.ex:99-100)
    warnings: list[dict] = field(default_factory=list)
    #: MQTT/RPC commands back to the device (A29): clean-session asks
    #: after processing errors (impl.ex:463-524,1413-1429)
    commands: list[dict] = field(default_factory=list)

    def extend(self, other: "Outputs") -> None:
        self.datastream_rows += other.datastream_rows
        self.property_upserts += other.property_upserts
        self.property_deletes += other.property_deletes
        self.object_rows += other.object_rows
        self.events += other.events
        self.errors += other.errors
        self.warnings += other.warnings
        self.commands += other.commands


def _event(state: DeviceState, event_type: str, ts: datetime, **kw: Any) -> dict:
    base = {
        "realm": state.realm,
        "device_id": state.device_id,
        "event_type": event_type,
        "timestamp": ts,
        "interface": None,
        "path": None,
        "value": None,
        "old_value": None,
        "new_value": None,
        "ip_address": None,
        "introspection": None,
    }
    base.update(kw)
    return base


def _error(state: DeviceState, msg: dict, error: str) -> dict:
    return {
        "realm": state.realm,
        "device_id": state.device_id,
        "message_id": msg.get("message_id"),
        "error": error,
        "interface": msg.get("interface"),
        "path": msg.get("path"),
    }


class Catalog:
    """Interface lookup by (name, major) — the broadcast dimension the
    stream joins against (impl.ex:1277-1332 cache-miss load)."""

    def __init__(self, interfaces: tuple[Interface, ...]):
        self.by_name_major = {(i.name, i.major): i for i in interfaces}

    def get(self, name: str, major: int) -> Interface | None:
        return self.by_name_major.get((name, major))


def process_message(state: DeviceState, catalog: Catalog, msg: dict) -> Outputs:
    """Fold one message into the state; returns side-outputs.

    Dispatch mirrors amqp_data_consumer.ex:167-270 (5 message types).
    """
    out = Outputs()
    mid = msg.get("message_id")
    if mid is not None:
        # redelivery dedup (message_tracker/server.ex:45-70)
        if mid in state.seen_message_ids:
            return out
        state.seen_message_ids[mid] = None
        if len(state.seen_message_ids) > 4096:
            it = iter(state.seen_message_ids)
            for k in [next(it) for _ in range(2048)]:
                del state.seen_message_ids[k]

    mtype = msg["msg_type"]
    ts = msg["reception_timestamp"]
    n_errors_before = len(out.errors)
    if mtype == "connection":
        _handle_connection(state, msg, ts, out)
    elif mtype == "disconnection":
        _handle_disconnection(state, ts, out)
    elif mtype == "introspection":
        _handle_introspection(state, catalog, msg, ts, out)
    elif mtype == "data":
        _handle_data(state, catalog, msg, ts, out)
    elif mtype == "control":
        _handle_control(state, catalog, msg, ts, out)
    elif mtype == "install_volatile_trigger":
        _handle_install_volatile_trigger(state, catalog, msg, ts, out)
    elif mtype == "delete_volatile_trigger":
        _handle_delete_volatile_trigger(state, msg, ts, out)
    else:
        out.errors.append(_error(state, msg, "unknown_message_type"))
    # every data/control/introspection processing error asks the device
    # for a clean session over MQTT RPC and flags pending_empty_cache
    # (impl.ex:463-524, :676-686, :1413-1429); trigger-RPC failures
    # reply on the RPC channel instead
    if mtype in ("data", "control", "introspection") and len(out.errors) > n_errors_before:
        state.pending_empty_cache = True
        out.commands.append(
            {
                "realm": state.realm,
                "device_id": state.device_id,
                "command": "clean_session",
                "timestamp": ts,
            }
        )
    return out


# -- connection lifecycle (impl.ex:89-164) ----------------------------------


def _handle_connection(state: DeviceState, msg: dict, ts: datetime, out: Outputs) -> None:
    state.connected = True
    state.last_connection = ts
    state.last_seen_ip = msg.get("ip_address")
    out.events.append(
        _event(state, "device_connected", ts, ip_address=state.last_seen_ip)
    )


def _handle_disconnection(state: DeviceState, ts: datetime, out: Outputs) -> None:
    state.connected = False
    state.last_disconnection = ts
    out.events.append(_event(state, "device_disconnected", ts))


# -- introspection (impl.ex:688-864) ----------------------------------------


def _handle_introspection(
    state: DeviceState, catalog: Catalog, msg: dict, ts: datetime, out: Outputs
) -> None:
    payload = msg.get("payload") or b""
    text = payload.decode("utf-8", errors="replace")
    parsed = parse_introspection(text)
    if parsed is None:
        out.errors.append(_error(state, msg, "invalid_introspection"))
        return
    _count_message(state, None, payload, out)
    out.events.append(
        _event(state, "incoming_introspection", ts, introspection=text)
    )
    new = {name: (major, minor) for name, major, minor in parsed}
    old = state.introspection
    # sorted Myers diff over (name, major) pairs (impl.ex:726-736):
    # a major bump appears as removed(old major) + added(new major);
    # a minor-only update is "eq" and fires nothing
    old_pairs = {(n, mm[0]) for n, mm in old.items()}
    new_pairs = {(n, mm[0]) for n, mm in new.items()}
    for name, major in sorted(new_pairs - old_pairs):
        out.events.append(
            _event(state, "interface_added", ts, interface=name,
                   value={"major_version": major, "minor_version": new[name][1]})
        )
        # re-announced (name, major) leaves the old-introspection map
        # (queries.ex:561-597 remove_old_interfaces)
        state.old_introspection.pop((name, major), None)
    for name, major in sorted(old_pairs - new_pairs):
        out.events.append(
            _event(state, "interface_removed", ts, interface=name,
                   value={"major_version": major})
        )
        # park the dropped version (impl.ex:826-834 add_old_interfaces)
        state.old_introspection[(name, major)] = old[name][1]
        # purge stored properties: data written under the old
        # interface_id must not leak into the new major (impl.ex:836-846)
        state.properties = {
            k: v for k, v in state.properties.items() if k[0] != name
        }
    state.introspection = new
    state.paths_cache.clear()  # impl.ex:860


# -- data (impl.ex:311-525) --------------------------------------------------


def _handle_data(
    state: DeviceState, catalog: Catalog, msg: dict, ts: datetime, out: Outputs
) -> None:
    interface_name = msg.get("interface") or ""
    path = msg.get("path") or ""
    payload = msg.get("payload") or b""

    # 1. path validation (impl.ex:559-566)
    if "//" in path or not path.startswith("/"):
        out.errors.append(_error(state, msg, "invalid_path"))
        return
    # 2. interface must be in announced introspection (impl.ex:1277-1332)
    if interface_name not in state.introspection:
        out.errors.append(_error(state, msg, "interface_not_in_introspection"))
        return
    major, _minor = state.introspection[interface_name]
    iface = catalog.get(interface_name, major)
    if iface is None:
        out.errors.append(_error(state, msg, "interface_loading_failed"))
        return
    # 3. ownership guard (impl.ex:1700-1708)
    if iface.ownership is not Ownership.DEVICE:
        out.errors.append(_error(state, msg, "cannot_write_on_server_owned_interface"))
        return
    # 4. decode (payloads_decoder.ex:29-62)
    try:
        decoded = decode_bson_payload(payload)
    except Exception:
        out.errors.append(_error(state, msg, "invalid_payload"))
        return

    _count_message(state, (interface_name, major), payload, out)

    if iface.aggregation is Aggregation.OBJECT:
        _handle_object_data(state, iface, path, decoded, ts, out, msg)
        return

    # 5. endpoint resolution (impl.ex:1610-1645)
    mapping = iface.resolve_path(path)
    if mapping is None:
        out.errors.append(_error(state, msg, "mapping_not_found"))
        return

    value = decoded.value
    if value is None:
        _handle_unset(state, iface, mapping, path, ts, out, msg)
        return

    # 7. type validation (impl.ex:568-598)
    vt = python_value_type(value)
    if not _type_ok(vt, mapping.value_type, value):
        out.errors.append(_error(state, msg, "unexpected_value_type"))
        return

    # 8. timestamp selection (impl.ex:331-336)
    value_ts = (
        datetime.fromtimestamp(decoded.timestamp_ms / 1000.0, tz=ts.tzinfo)
        if (mapping.explicit_timestamp and decoded.timestamp_ms is not None)
        else ts
    )

    out.events.append(
        _event(state, "incoming_data", ts, interface=interface_name, path=path, value=value)
    )
    # step 9 of the hot path (impl.ex:338-348): incoming-data triggers
    _fire_volatile_triggers(state, iface, mapping, path, value, ts, out)

    if iface.type is InterfaceType.PROPERTIES:
        _handle_property_set(state, iface, mapping, path, value, ts, out)
    else:
        _handle_datastream(state, iface, mapping, path, value, value_ts, ts, out)


def _handle_property_set(state, iface, mapping, path, value, ts, out) -> None:
    """Property upsert + change-detection events (impl.ex:233-309)."""
    key = (iface.name, path)
    prev = state.properties.get(key)
    if prev is None:
        out.events.append(
            _event(state, "path_created", ts, interface=iface.name, path=path, value=value)
        )
    elif prev != value:
        out.events.append(
            _event(state, "value_change", ts, interface=iface.name, path=path,
                   old_value=prev, new_value=value)
        )
    state.properties[key] = value
    row = _typed_row(state, iface, mapping, path, value, ts)
    out.property_upserts.append(row)
    if prev is not None and prev != value:
        out.events.append(
            _event(state, "value_change_applied", ts, interface=iface.name, path=path,
                   old_value=prev, new_value=value)
        )


def _handle_unset(state, iface, mapping, path, ts, out, msg) -> None:
    """Property unset -> DELETE (queries.ex:87-119); datastreams cannot
    be unset."""
    if iface.type is not InterfaceType.PROPERTIES:
        out.errors.append(_error(state, msg, "unexpected_value_type"))
        return
    if not mapping.allow_unset:
        # reference logs a warning but still deletes, with NO
        # clean-session escalation (queries.ex:99-100) — so this goes
        # to the warnings side-output, not out.errors
        out.warnings.append(_error(state, msg, "unset_not_allowed"))
    key = (iface.name, path)
    prev = state.properties.pop(key, None)
    if prev is not None:
        out.events.append(
            _event(state, "path_removed", ts, interface=iface.name, path=path)
        )
    out.property_deletes.append(
        {
            "realm": state.realm,
            "device_id": state.device_id,
            "interface_id": iface.interface_id,
            "interface": iface.name,
            "endpoint_id": mapping.endpoint_id,
            "path": path,
            "reception_timestamp": ts,
        }
    )


def effective_retention_s(
    mapping_expiry: int | None, cap_s: int | None
) -> int | None:
    """min(mapping expiry, realm cap) — an ANALYTICS combinator (used
    by q100's effective-TTL view), deliberately NOT what the ingest
    path applies: the reference's insert TTL is the realm cap ALONE
    (impl.ex:427-438 passes ``state.datastream_maximum_storage_retention``
    verbatim; the mapping is never consulted), which
    :func:`_handle_datastream` now mirrors exactly.
    """
    if mapping_expiry and cap_s:
        return min(mapping_expiry, cap_s)
    return mapping_expiry or cap_s or None


def path_ttl_s(cap_s: int | None) -> int | None:
    """Path-registry TTL: 2.5x the realm cap (impl.ex:527-533:
    ``retention_secs * 2 + div(retention_secs, 2)``); nil cap -> no TTL."""
    return cap_s * 2 + cap_s // 2 if cap_s else None


def _handle_datastream(state, iface, mapping, path, value, value_ts, ts, out) -> None:
    """Individual datastream append (queries.ex:157-197) + path
    registry gate (impl.ex:386-416).

    TTL semantics follow the reference exactly: the realm cap alone is
    the insert TTL (impl.ex:438 — mapping expiry is not consulted) and
    the registry row gets 2.5x the cap (impl.ex:414,527-533). The
    re-registration gate is ``is_still_valid?`` (impl.ex:547-557): a
    registry row written at t0 with TTL 2.5*cap stops being "still
    valid" once now + cap + 3600 >= t0 + 2.5*cap, i.e. age >=
    1.5*cap - 3600. (The reference's ``Cache.has_key?`` is inverted —
    cache.ex:69-80 returns ``not is_valid`` — so its in-memory cache
    never short-circuits the DB check; the DB-expiry gate is the
    effective behavior and is what we model. With no cap the registry
    row has no expiry and registration happens once per path.)
    """
    key = (iface.name, path)
    cap = state.max_retention_s
    ttl_s = path_ttl_s(cap)
    cached = state.paths_cache.get(key)
    needs_registry = cached is None or (
        cap is not None
        and (ts - cached).total_seconds()
        >= max(1.5 * cap - PATH_TTL_TOLERANCE_S, 0)
    )
    if needs_registry:
        if cached is None and len(state.paths_cache) >= PATHS_CACHE_SIZE:
            # random eviction in the reference (cache.ex:24-40); evict
            # deterministically (oldest) for reproducibility
            oldest = min(state.paths_cache, key=lambda k: state.paths_cache[k])
            del state.paths_cache[oldest]
        state.paths_cache[key] = ts
        out.property_upserts.append(
            {
                "realm": state.realm,
                "device_id": state.device_id,
                "interface_id": iface.interface_id,
                "interface": iface.name,
                "endpoint_id": mapping.endpoint_id,
                "path": path,
                "reception_timestamp": ts,
                "datetime_value": value_ts,  # path registry row (queries.ex:353-393)
                "is_path_registry": True,
                "expires_at": ts + timedelta(seconds=ttl_s) if ttl_s else None,
            }
        )
    row = _typed_row(state, iface, mapping, path, value, ts)
    row["value_timestamp"] = value_ts
    # the realm cap ALONE is the insert TTL on every datastream value
    # (impl.ex:438); mapping expiry is not consulted by the reference
    if cap:
        row["expires_at"] = ts + timedelta(seconds=cap)
    out.datastream_rows.append(row)
    out.events.append(
        _event(state, "value_stored", ts, interface=iface.name, path=path, value=value)
    )


def _handle_object_data(state, iface, path, decoded, ts, out, msg) -> None:
    """Object-aggregated insert (queries.ex:199-297): one wide row, one
    column per known leaf; an unknown key DISCARDS the whole message
    (impl.ex:519-524 validate_value_type reduce_while halt); absent
    keys stay NULL but are never overwritten downstream."""
    value = decoded.value
    if not isinstance(value, dict):
        out.errors.append(_error(state, msg, "unexpected_value_type"))
        return
    mappings = iface.resolve_object_prefix(path)
    if not mappings:
        out.errors.append(_error(state, msg, "mapping_not_found"))
        return
    by_leaf = {m.endpoint.rsplit("/", 1)[-1]: m for m in mappings}
    row: dict[str, Any] = {
        "realm": state.realm,
        "device_id": state.device_id,
        "table": object_table_name(iface.name, iface.major),
        "path": path,
        "reception_timestamp": ts,
    }
    wrote_any = False
    for k, v in value.items():
        m = by_leaf.get(k)
        if m is None:
            # reference halts validation and writes NOTHING on an
            # unexpected key (impl.ex:519-524): discard whole message
            out.errors.append(_error(state, msg, f"unexpected_object_key:{k}"))
            return
        vt = python_value_type(v)
        if not _type_ok(vt, m.value_type, v):
            out.errors.append(_error(state, msg, "unexpected_value_type"))
            return
        row[object_column_name(m.endpoint)] = v
        wrote_any = True
    if not wrote_any:
        return  # tombstone avoidance: never write NULL-only rows (queries.ex:247-266)
    if decoded.timestamp_ms is not None and any(m.explicit_timestamp for m in mappings):
        row["value_timestamp"] = datetime.fromtimestamp(
            decoded.timestamp_ms / 1000.0, tz=ts.tzinfo
        )
    # the realm cap applies to object-aggregated inserts too — the
    # reference routes them through the same insert_value_into_db with
    # ttl: cap (impl.ex:438, queries.ex:199-297)
    if state.max_retention_s:
        row["expires_at"] = ts + timedelta(seconds=state.max_retention_s)
    out.object_rows.append(row)
    out.events.append(
        _event(state, "incoming_data", ts, interface=iface.name, path=path, value=value)
    )


# -- volatile triggers, the A32 RPC control plane ----------------------------


def _handle_install_volatile_trigger(state, catalog, msg, ts, out) -> None:
    """Install a per-device volatile trigger (impl.ex:946-1058).

    Spec arrives as a JSON payload {trigger_id, interface, path, op,
    known_value} (the protobuf of rpc/handler.ex:35-48 flattened).
    Validation mirrors the reference: the interface must be present in
    the device introspection and loadable; object-aggregated
    interfaces are rejected (impl.ex:976-980); the match path must
    resolve against the endpoints (impl.ex:987,1015-1016).
    """
    import json as _json

    try:
        spec = _json.loads((msg.get("payload") or b"{}").decode("utf-8"))
    except Exception:
        out.errors.append(_error(state, msg, "invalid_payload"))
        return
    trigger_id = spec.get("trigger_id")
    iface_name = spec.get("interface")
    match_path = spec.get("path")
    if not trigger_id or not iface_name or not match_path:
        out.errors.append(_error(state, msg, "invalid_payload"))
        return
    major_minor = state.introspection.get(iface_name)
    if major_minor is None:
        out.errors.append(_error(state, msg, "interface_not_in_introspection"))
        return
    iface = catalog.get(iface_name, major_minor[0])
    if iface is None:
        out.errors.append(_error(state, msg, "interface_loading_failed"))
        return
    if iface.aggregation is Aggregation.OBJECT:
        # volatile data triggers on object interfaces are unsupported
        # in the reference too (impl.ex:976-980)
        out.errors.append(_error(state, msg, "invalid_match_path"))
        return
    if iface.resolve_path(match_path) is None and not any(
        m.endpoint == match_path for m in iface.mappings
    ):
        out.errors.append(_error(state, msg, "invalid_match_path"))
        return
    state.volatile_triggers[trigger_id] = {
        "interface": iface_name,
        "path": match_path,
        "op": spec.get("op", "ANY"),
        "known_value": spec.get("known_value"),
    }
    out.events.append(
        _event(state, "volatile_trigger_installed", ts,
               interface=iface_name, path=match_path, value=trigger_id)
    )


def _handle_delete_volatile_trigger(state, msg, ts, out) -> None:
    """Delete a volatile trigger by id (impl.ex:1060-1189)."""
    import json as _json

    try:
        spec = _json.loads((msg.get("payload") or b"{}").decode("utf-8"))
    except Exception:
        out.errors.append(_error(state, msg, "invalid_payload"))
        return
    trigger_id = spec.get("trigger_id")
    dropped = state.volatile_triggers.pop(trigger_id, None)
    if dropped is None:
        out.errors.append(_error(state, msg, "trigger_not_found"))
        return
    out.events.append(
        _event(state, "volatile_trigger_deleted", ts,
               interface=dropped["interface"], path=dropped["path"],
               value=trigger_id)
    )


def _fire_volatile_triggers(state, iface, mapping, path, value, ts, out) -> None:
    """Evaluate installed volatile triggers against an incoming value
    (the per-record match of impl.ex:1431-1469 restricted to the
    device-local volatile set). A trigger matches when its interface
    matches, its path is the literal incoming path or the endpoint
    pattern the path resolved to, and the value operator passes."""
    for trigger_id, spec in sorted(state.volatile_triggers.items()):
        if spec["interface"] != iface.name:
            continue
        if spec["path"] not in (path, mapping.endpoint):
            continue
        if not py_value_match(spec["op"], value, spec.get("known_value")):
            continue
        out.events.append(
            _event(state, "volatile_trigger_fired", ts,
                   interface=iface.name, path=path, value=trigger_id,
                   new_value=value)
        )


# -- control (impl.ex:866-944) -----------------------------------------------


def _handle_control(state, catalog, msg, ts, out) -> None:
    path = msg.get("path") or ""
    if path == "/producer/properties":
        _handle_property_prune(state, catalog, msg, ts, out)
    elif path == "/emptyCache":
        # the reference answers /emptyCache by resending every stored
        # server-owned property to the device and clearing the pending
        # flag (impl.ex:921-935: send_control_consumer_properties +
        # resend_all_properties + set_pending_empty_cache false); the
        # resend itself is the q26 batch operator — here the command
        # channel carries the ask so the sink can run it
        state.pending_empty_cache = False
        out.commands.append(
            {
                "realm": state.realm,
                "device_id": state.device_id,
                "command": "resend_properties",
                "timestamp": ts,
            }
        )
        out.events.append(_event(state, "device_empty_cache_received", ts))
    else:
        out.errors.append(_error(state, msg, "unexpected_control_message"))


def _handle_property_prune(state, catalog, msg, ts, out) -> None:
    """Producer-properties prune (impl.ex:1334-1411): payload is
    <<size::32, zlib(paths ';' joined)>> (payloads_decoder.ex:128-159);
    every stored device-owned property path NOT in the set is deleted
    with a path_removed event — the left anti join of SURVEY §2 A24."""
    payload = msg.get("payload") or b""
    if len(payload) < 4:
        out.errors.append(_error(state, msg, "invalid_payload"))
        return
    inflated = safe_inflate(payload[4:])
    if inflated is None:
        out.errors.append(_error(state, msg, "invalid_payload"))
        return
    text = inflated.decode("utf-8", errors="replace")
    alive: set[tuple[str, str]] = set()
    if text:
        for entry in text.split(";"):
            name, _, p = entry.partition("/")
            alive.add((name, "/" + p))
    for (iface_name, path) in sorted(set(state.properties) - alive):
        major_minor = state.introspection.get(iface_name)
        if major_minor is None:
            continue
        iface = catalog.get(iface_name, major_minor[0])
        if iface is None or iface.ownership is not Ownership.DEVICE:
            continue
        if iface.type is not InterfaceType.PROPERTIES:
            continue
        del state.properties[(iface_name, path)]
        mapping = iface.resolve_path(path)
        out.property_deletes.append(
            {
                "realm": state.realm,
                "device_id": state.device_id,
                "interface_id": iface.interface_id,
                "interface": iface_name,
                "endpoint_id": mapping.endpoint_id if mapping else None,
                "path": path,
                "reception_timestamp": ts,
            }
        )
        out.events.append(
            _event(state, "path_removed", ts, interface=iface_name, path=path)
        )


# -- helpers -----------------------------------------------------------------


def _count_message(state, iface_key, payload: bytes, out: Outputs) -> None:
    """Counters (impl.ex:623-674): total msgs/bytes, per-interface."""
    size = len(payload)
    state.total_received_msgs += 1
    state.total_received_bytes += size
    if iface_key is not None:
        state.interface_msgs[iface_key] = state.interface_msgs.get(iface_key, 0) + 1
        state.interface_bytes[iface_key] = state.interface_bytes.get(iface_key, 0) + size


def _type_ok(actual: ValueType | None, expected: ValueType, value: Any) -> bool:
    """Type conformance (impl.ex:568-598): ints widen to longinteger
    and to double (BSON int32/64 may carry numeric doubles); empty
    arrays match any array type."""
    if actual is None:
        if isinstance(value, list) and not value:
            return expected.is_array
        return False
    if actual == expected:
        return True
    if actual is ValueType.INTEGER and expected in (ValueType.LONGINTEGER, ValueType.DOUBLE):
        return True
    if actual is ValueType.LONGINTEGER and expected is ValueType.DOUBLE:
        return True
    if actual is ValueType.INTEGERARRAY and expected in (
        ValueType.LONGINTEGERARRAY,
        ValueType.DOUBLEARRAY,
    ):
        return True
    return False


def _typed_row(state, iface, mapping, path, value: Any, ts: datetime) -> dict:
    """Route a value into its typed storage column
    (CQLUtils.type_to_db_column_name; queries.ex:139,178)."""
    vt = mapping.value_type
    if vt in (ValueType.DOUBLE, ValueType.DOUBLEARRAY):
        value = (
            [float(v) for v in value] if isinstance(value, list) else float(value)
        )
    if vt in (ValueType.LONGINTEGER, ValueType.LONGINTEGERARRAY):
        value = [int(v) for v in value] if isinstance(value, list) else int(value)
    return {
        "realm": state.realm,
        "device_id": state.device_id,
        "interface_id": iface.interface_id,
        "interface": iface.name,
        "endpoint_id": mapping.endpoint_id,
        "path": path,
        "reception_timestamp": ts,
        db_column_name(vt): value,
    }


def process_device_messages(
    state: DeviceState, catalog: Catalog, messages: list[dict],
    presorted: bool = False,
) -> Outputs:
    """Fold a batch of one device's messages in order.

    Ordering: (reception_timestamp, message_id) — the reference's
    per-device FIFO (SURVEY §7 hard parts: cross-batch total order is
    approximated by event-time sort + idempotent sinks).

    ``presorted=True`` skips the per-device Python sort when the
    caller already ordered the whole bucket frame vectorized (one
    stable pandas sort replaces ~1500 per-device ``sorted()`` calls
    per batch; both are stable, so tie order is identical).
    """
    out = Outputs()
    if not presorted:
        messages = sorted(
            messages,
            key=lambda m: (m["reception_timestamp"], str(m.get("message_id"))),
        )
    for msg in messages:
        out.extend(process_message(state, catalog, msg))
    return out
