"""AMQP event wire format: SimpleEvent payloads + routing headers.

The reference publishes every triggered event on the events exchange as
a protobuf-encoded ``SimpleEvent`` with five ``x_astarte_*`` routing
headers (``triggers_handler.ex:377-459``; header list at ``:444-455``,
envelope at ``:377-394``). This module re-expresses that wire contract:

- :func:`encode_simple_event` / :func:`decode_simple_event` — a
  minimal protobuf wire-format codec (varints + length-delimited
  fields, the public protobuf encoding) for the SimpleEvent envelope
  and its per-type event submessages. Field numbering follows
  astarte_core's public ``simple_events.proto`` (version 1); the exact
  layout is documented in ``_EVENT_FIELDS`` below and round-trip
  checked by the golden tests so any renumbering shows up as a test
  diff rather than silent corruption.
- :func:`simple_event_headers` — the 5-header list, byte-for-byte the
  reference's (``triggers_handler.ex:444-455``).
- :func:`events_wire_table` — the Spark materializer: takes the event
  rows the state machine emitted and a broadcastable target dimension
  and produces (routing_key, headers, payload) rows an AMQP publisher
  could hand straight to basic_publish. Headers are native map
  columns; the payload is built in an Arrow-batched pandas UDF (small
  binary records; no row-at-a-time Python in the plan).
"""

from __future__ import annotations

import json
import uuid
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.payloads import encode_document

# ---------------------------------------------------------------------------
# Minimal protobuf wire codec (public wire format: varint keys,
# wire-type 0 = varint, 2 = length-delimited)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    # Protobuf encodes negative int32/int64 as the 64-bit two's
    # complement (a 10-byte varint); Python's arithmetic shift would
    # loop forever on a negative value, so mask to 64 bits first.
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(num: int, value: int) -> bytes:
    return _varint(num << 3 | 0) + _varint(value)


def _field_bytes(num: int, value: bytes) -> bytes:
    return _varint(num << 3 | 2) + _varint(len(value)) + value


def _field_str(num: int, value: str) -> bytes:
    return _field_bytes(num, value.encode("utf-8"))


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _signed64(n: int) -> int:
    """Undo the 64-bit two's-complement masking applied on encode."""
    return n - (1 << 64) if n >= (1 << 63) else n


def _decode_message(buf: bytes) -> dict[int, list[Any]]:
    """Generic decode: field number -> list of raw values (int|bytes)."""
    fields: dict[int, list[Any]] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        num, wt = key >> 3, key & 0x07
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        else:  # wire types 1/5 don't appear in SimpleEvent
            raise ValueError(f"unsupported wire type {wt}")
        fields.setdefault(num, []).append(val)
    return fields


# ---------------------------------------------------------------------------
# SimpleEvent layout (astarte_core simple_events.proto, version 1)
# ---------------------------------------------------------------------------

#: envelope scalar fields (triggers_handler.ex:386-394)
_F_SIMPLE_TRIGGER_ID = 1  # bytes (uuid)
_F_PARENT_TRIGGER_ID = 2  # bytes (uuid)
_F_REALM = 3  # string
_F_DEVICE_ID = 4  # string
_F_TIMESTAMP = 5  # int64, milliseconds (data_updater_test.exs:116-117,147)
_F_VERSION = 6  # int32, currently 1

#: oneof event: our event_type name -> (field number, submessage layout)
#: submessage layout: ordered (field number, kind, row key); kind is
#: 's'tring, 'b'son-value, 'i'nt
_EVENT_FIELDS: dict[str, tuple[int, tuple[tuple[int, str, str], ...]]] = {
    "device_connected": (7, ((1, "s", "ip_address"),)),
    "device_disconnected": (8, ()),
    "incoming_data": (
        9,
        ((1, "s", "interface"), (2, "s", "path"), (3, "v", "value")),
    ),
    "value_change": (
        10,
        (
            (1, "s", "interface"),
            (2, "s", "path"),
            (3, "v", "old_value"),
            (4, "v", "new_value"),
        ),
    ),
    "value_change_applied": (
        11,
        (
            (1, "s", "interface"),
            (2, "s", "path"),
            (3, "v", "old_value"),
            (4, "v", "new_value"),
        ),
    ),
    "path_created": (
        12,
        ((1, "s", "interface"), (2, "s", "path"), (3, "v", "value")),
    ),
    "path_removed": (13, ((1, "s", "interface"), (2, "s", "path"))),
    "value_stored": (
        14,
        ((1, "s", "interface"), (2, "s", "path"), (3, "v", "value")),
    ),
    "incoming_introspection": (15, ((1, "s", "introspection"),)),
    "interface_added": (
        16,
        ((1, "s", "interface"), (2, "i", "major"), (3, "i", "minor")),
    ),
    "interface_removed": (17, ((1, "s", "interface"), (2, "i", "major"))),
    "interface_minor_updated": (
        18,
        (
            (1, "s", "interface"),
            (2, "i", "major"),
            (3, "i", "old_minor"),
            (4, "i", "new_minor"),
        ),
    ),
}


def _bson_value(value: Any) -> bytes:
    """Values ride as BSON ``{v: value}`` docs, the reference's
    Cyanide.dump wrapping (triggers_handler.ex event structs carry
    ``bson_value`` fields)."""
    return encode_document({"v": value})


def encode_simple_event(
    event_type: str,
    row: dict[str, Any],
    *,
    realm: str,
    device_id: str,
    timestamp_ms: int,
    simple_trigger_id: bytes,
    parent_trigger_id: bytes,
) -> bytes:
    """Serialize one event row as a SimpleEvent (triggers_handler.ex:377-394)."""
    field_num, layout = _EVENT_FIELDS[event_type]
    body = b""
    for num, kind, key in layout:
        val = row.get(key)
        if val is None:
            continue
        if kind == "s":
            body += _field_str(num, str(val))
        elif kind == "i":
            body += _field_varint(num, int(val))
        else:  # 'v': BSON-wrapped value
            body += _field_bytes(num, _bson_value(val))
    return (
        _field_bytes(_F_SIMPLE_TRIGGER_ID, simple_trigger_id)
        + _field_bytes(_F_PARENT_TRIGGER_ID, parent_trigger_id)
        + _field_str(_F_REALM, realm)
        + _field_str(_F_DEVICE_ID, device_id)
        + _field_varint(_F_TIMESTAMP, timestamp_ms)
        + _field_varint(_F_VERSION, 1)
        + _field_bytes(field_num, body)
    )


_NUM_TO_EVENT = {num: (name, layout) for name, (num, layout) in _EVENT_FIELDS.items()}


def decode_simple_event(buf: bytes) -> dict[str, Any]:
    """Inverse of :func:`encode_simple_event`, for golden tests and
    consumers (the reference asserts on the decoded struct,
    data_updater_test.exs:139-152)."""
    from ..functions.payloads import decode_document

    fields = _decode_message(buf)
    out: dict[str, Any] = {
        "simple_trigger_id": bytes(fields[_F_SIMPLE_TRIGGER_ID][0]),
        "parent_trigger_id": bytes(fields[_F_PARENT_TRIGGER_ID][0]),
        "realm": fields[_F_REALM][0].decode("utf-8"),
        "device_id": fields[_F_DEVICE_ID][0].decode("utf-8"),
        "timestamp": _signed64(fields[_F_TIMESTAMP][0]),
        "version": fields[_F_VERSION][0],
    }
    for num, vals in fields.items():
        if num in _NUM_TO_EVENT:
            name, layout = _NUM_TO_EVENT[num]
            sub = _decode_message(bytes(vals[0]))
            ev: dict[str, Any] = {}
            for fnum, kind, key in layout:
                if fnum not in sub:
                    continue
                raw = sub[fnum][0]
                if kind == "s":
                    ev[key] = raw.decode("utf-8")
                elif kind == "i":
                    ev[key] = _signed64(raw)
                else:
                    ev[key] = decode_document(bytes(raw))[0]["v"]
            out["event"] = (name, ev)
    return out


def simple_event_headers(
    realm: str,
    device_id: str,
    simple_trigger_id: bytes,
    parent_trigger_id: bytes,
    event_type: str,
) -> list[tuple[str, str]]:
    """The 5 routing headers, ordered as the reference builds them
    (triggers_handler.ex:444-455); trigger ids travel as canonical
    UUID strings, the event type as the oneof field name."""
    return [
        ("x_astarte_realm", realm),
        ("x_astarte_device_id", device_id),
        ("x_astarte_simple_trigger_id", str(uuid.UUID(bytes=simple_trigger_id))),
        ("x_astarte_parent_trigger_id", str(uuid.UUID(bytes=parent_trigger_id))),
        ("x_astarte_event_type", f"{event_type}_event"),
    ]


def trigger_uuid(trigger_id: str) -> bytes:
    """Deterministic UUID for a fixture trigger id (the reference gets
    these from the triggers table; a name-derived UUIDv5 keeps the
    wire format testable without one)."""
    return uuid.uuid5(uuid.NAMESPACE_URL, f"astarte-trigger:{trigger_id}").bytes


PARENT_TRIGGER_ID = uuid.uuid5(uuid.NAMESPACE_URL, "astarte-trigger:parent").bytes


# ---------------------------------------------------------------------------
# Volatile-trigger RPC codec (rpc/handler.ex:35-100)
#
# The reference's RPC endpoint receives a protobuf ``Call`` envelope
# (astarte_rpc's public dataupdaterplant.proto) carrying one of
# InstallVolatileTrigger / DeleteVolatileTrigger, dispatches it to the
# per-device GenServer, and answers with a ``Reply`` envelope wrapping
# GenericOkReply or GenericErrorReply. This section re-expresses that
# wire contract with the same minimal varint codec as SimpleEvent;
# field numbering follows the public proto's declaration order and is
# documented here + round-trip checked by the golden tests, so any
# renumbering shows up as a test diff rather than silent corruption.
# ---------------------------------------------------------------------------

#: Call.call oneof (rpc/handler.ex:52-98 clause order)
_F_CALL_INSTALL = 1  # InstallVolatileTrigger
_F_CALL_DELETE = 2  # DeleteVolatileTrigger

#: InstallVolatileTrigger fields (rpc/handler.ex:52-61 struct order)
_INSTALL_FIELDS = (
    (1, "s", "realm_name"),
    (2, "s", "device_id"),
    (3, "b", "object_id"),
    (4, "i", "object_type"),
    (5, "b", "parent_id"),
    (6, "b", "simple_trigger_id"),
    (7, "b", "simple_trigger"),
    (8, "b", "trigger_target"),
)

#: DeleteVolatileTrigger fields (rpc/handler.ex:85-89 struct order)
_DELETE_FIELDS = (
    (1, "s", "realm_name"),
    (2, "s", "device_id"),
    (3, "b", "trigger_id"),
)

#: Reply envelope: oneof reply + error flag (handler.ex:119-129)
_F_REPLY_OK = 1  # GenericOkReply (empty message)
_F_REPLY_ERROR = 2  # GenericErrorReply
_F_REPLY_ERROR_FLAG = 3  # bool, true on the error arm

#: GenericErrorReply fields (handler.ex:101-115 struct order)
_ERROR_REPLY_FIELDS = (
    (1, "s", "error_name"),
    (2, "s", "user_readable_message"),
    (3, "s", "user_readable_error_name"),
    (4, "s", "error_data"),
)


def _encode_fields(layout: tuple, row: dict[str, Any]) -> bytes:
    body = b""
    for num, kind, key in layout:
        val = row.get(key)
        if val is None:
            continue
        if kind == "s":
            body += _field_str(num, str(val))
        elif kind == "i":
            body += _field_varint(num, int(val))
        else:  # 'b'
            body += _field_bytes(num, bytes(val))
    return body


def _decode_fields(layout: tuple, buf: bytes) -> dict[str, Any]:
    sub = _decode_message(buf)
    out: dict[str, Any] = {}
    for num, kind, key in layout:
        if num not in sub:
            continue
        raw = sub[num][0]
        if kind == "s":
            out[key] = raw.decode("utf-8")
        elif kind == "i":
            out[key] = _signed64(raw)
        else:
            out[key] = bytes(raw)
    return out


def encode_install_volatile_trigger_call(**fields: Any) -> bytes:
    """Call{install_volatile_trigger: InstallVolatileTrigger{...}}.

    ``simple_trigger`` rides as bytes exactly like the reference (there
    an astarte_core TaggedSimpleTrigger protobuf; here the engine's
    JSON match spec ``{interface, path, op, known_value}`` — the
    in-engine trigger format, documented divergence)."""
    return _field_bytes(_F_CALL_INSTALL, _encode_fields(_INSTALL_FIELDS, fields))


def encode_delete_volatile_trigger_call(**fields: Any) -> bytes:
    """Call{delete_volatile_trigger: DeleteVolatileTrigger{...}}."""
    return _field_bytes(_F_CALL_DELETE, _encode_fields(_DELETE_FIELDS, fields))


def decode_call(buf: bytes) -> tuple[str, dict[str, Any]]:
    """Inverse of the two encoders: (call_name, fields). An empty
    envelope raises ValueError (handler.ex:40-43 rejects empty calls)."""
    fields = _decode_message(buf)
    if _F_CALL_INSTALL in fields:
        return (
            "install_volatile_trigger",
            _decode_fields(_INSTALL_FIELDS, bytes(fields[_F_CALL_INSTALL][0])),
        )
    if _F_CALL_DELETE in fields:
        return (
            "delete_volatile_trigger",
            _decode_fields(_DELETE_FIELDS, bytes(fields[_F_CALL_DELETE][0])),
        )
    raise ValueError("empty call")


def encode_generic_ok_reply() -> bytes:
    """Reply{reply: generic_ok_reply, error: false} (handler.ex:119-122)."""
    return _field_bytes(_F_REPLY_OK, b"")


def encode_generic_error_reply(
    error_name: str,
    user_readable_message: str | None = None,
    user_readable_error_name: str | None = None,
    error_data: str | None = None,
) -> bytes:
    """Reply{reply: generic_error_reply, error: true} (handler.ex:101-127)."""
    body = _encode_fields(
        _ERROR_REPLY_FIELDS,
        {
            "error_name": error_name,
            "user_readable_message": user_readable_message,
            "user_readable_error_name": user_readable_error_name,
            "error_data": error_data,
        },
    )
    return _field_bytes(_F_REPLY_ERROR, body) + _field_varint(_F_REPLY_ERROR_FLAG, 1)


def decode_reply(buf: bytes) -> dict[str, Any]:
    """Decode a Reply envelope: {"ok": bool, ...error fields}."""
    fields = _decode_message(buf)
    if _F_REPLY_OK in fields:
        return {"ok": True}
    if _F_REPLY_ERROR in fields:
        out = _decode_fields(_ERROR_REPLY_FIELDS, bytes(fields[_F_REPLY_ERROR][0]))
        out["ok"] = False
        return out
    raise ValueError("empty reply")


def rpc_call_to_message(buf: bytes, *, message_id: str, timestamp) -> dict[str, Any]:
    """Bridge: decoded Call -> the state machine's message dict
    (MESSAGE_SCHEMA shape), so RPC-driven installs/deletes flow through
    the same per-device fold as data (data_updater.ex:97-121 routes the
    RPC to the same GenServer serial queue)."""
    name, f = decode_call(buf)
    if name == "install_volatile_trigger":
        spec = json.loads((f.get("simple_trigger") or b"{}").decode("utf-8"))
        spec["trigger_id"] = str(uuid.UUID(bytes=f["simple_trigger_id"]))
        payload = json.dumps(spec).encode("utf-8")
    else:
        payload = json.dumps(
            {"trigger_id": str(uuid.UUID(bytes=f["trigger_id"]))}
        ).encode("utf-8")
    return {
        "message_id": message_id,
        "reception_timestamp": timestamp,
        "realm": f["realm_name"],
        "device_id": f["device_id"],
        "msg_type": name,
        "interface": None,
        "path": None,
        "payload": payload,
        "ip_address": None,
    }


# ---------------------------------------------------------------------------
# Spark materializer
# ---------------------------------------------------------------------------

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("routing_key", T.StringType(), True),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def events_wire_table(events: DataFrame, targets: DataFrame) -> DataFrame:
    """Publishable event rows: one per (event x matching target).

    ``events`` is :func:`events_table` output; ``targets`` maps
    ``trigger_id -> (routing_key)`` plus the event types it fires on
    (``t_event_type``, '*' wildcard) — the reference's per-trigger
    AMQPTriggerTarget list (triggers_handler.ex:396-402,432-459).

    Plan shape: the target dim splits into exact-match rows (broadcast
    HASH join on event_type — O(events) however many typed triggers
    exist) and the usually-tiny wildcard rows (broadcast nested loop,
    bounded by the wildcard count alone); headers build natively, then
    one Arrow-batched pandas UDF encodes the protobuf payloads. No
    shuffle beyond the fan-out joins — an OR-condition join would have
    nested-looped the FULL target set against every event.

    Typed values: when ``events`` carries the ``typed_json`` column
    (events_table output), its number/bool/int fields override the
    string-cast tabular columns, so e.g. an integer value goes on the
    wire as an integer BSON value like the reference's
    (data_updater_test.exs asserts an integer bson_value).
    """
    exact = events.join(
        F.broadcast(targets.filter(F.col("t_event_type") != "*")),
        F.col("t_event_type") == F.col("event_type"),
    )
    wildcard = events.crossJoin(
        F.broadcast(targets.filter(F.col("t_event_type") == "*"))
    )
    matched = exact.unionByName(wildcard)
    has_typed = "typed_json" in events.columns

    @F.pandas_udf(T.BinaryType())
    def encode_batch(
        event_type: pd.Series,
        trigger_id: pd.Series,
        realm: pd.Series,
        device_id: pd.Series,
        ts_ms: pd.Series,
        row_json: pd.Series,
        typed_json: pd.Series,
    ) -> pd.Series:
        out = []
        for et, tid, rlm, dev, ms, rj, tj in zip(
            event_type, trigger_id, realm, device_id, ts_ms, row_json, typed_json
        ):
            row = json.loads(rj)
            if tj:  # typed payload wins over string-cast columns
                for k, v in json.loads(tj).items():
                    if v is not None:
                        row[k] = v
            out.append(
                encode_simple_event(
                    et,
                    row,
                    realm=rlm,
                    device_id=dev,
                    timestamp_ms=int(ms),
                    simple_trigger_id=trigger_uuid(tid),
                    parent_trigger_id=PARENT_TRIGGER_ID,
                )
            )
        return pd.Series(out)

    @F.pandas_udf(T.StringType())
    def trigger_uuid_str(trigger_id: pd.Series) -> pd.Series:
        return trigger_id.map(lambda t: str(uuid.UUID(bytes=trigger_uuid(t))))

    row_json = F.to_json(
        F.struct(
            "interface", "path", "value", "old_value", "new_value",
            "ip_address", "introspection",
        )
    )
    ts_ms = (F.unix_millis(F.col("timestamp").cast("timestamp"))).cast("long")
    parent_str = str(uuid.UUID(bytes=PARENT_TRIGGER_ID))
    headers = F.create_map(
        F.lit("x_astarte_realm"), F.col("realm"),
        F.lit("x_astarte_device_id"), F.col("device_id"),
        F.lit("x_astarte_simple_trigger_id"), trigger_uuid_str(F.col("trigger_id")),
        F.lit("x_astarte_parent_trigger_id"), F.lit(parent_str),
        F.lit("x_astarte_event_type"), F.concat(F.col("event_type"), F.lit("_event")),
    )
    typed = F.col("typed_json") if has_typed else F.lit(None).cast("string")
    return matched.select(
        F.col("routing_key"),
        headers.alias("headers"),
        encode_batch(
            F.col("event_type"), F.col("trigger_id"), F.col("realm"),
            F.col("device_id"), ts_ms, row_json, typed,
        ).alias("payload"),
    )
