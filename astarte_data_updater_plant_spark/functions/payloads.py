"""Payload decode: BSON `{v,t,m}` documents and zlib property lists.

Re-expresses ``payloads_decoder.ex``:

- ``decode_bson_payload`` (:29-62): BSON doc -> (value,
  value_timestamp_ms, metadata); empty payload or ``{v: <empty
  binary>}`` means **unset** (:43-44,59-61); embedded doc as ``v`` is
  an object-aggregation value (:49-51).
- ``safe_inflate`` (:68-120): bounded zlib decompress with a 10 MiB
  zip-bomb guard (:22).
- ``parse_introspection`` (:164-222): ``"name:major:minor;..."``.

The BSON subset decoder is pure Python (the container has no bson
package) and covers exactly the types the reference's payloads use:
double, string, document, array, binary, boolean, datetime, int32,
int64. In the pipeline these run as Arrow-batched functions inside
``mapInPandas`` — the only Python in the hot path, as SURVEY §2B
prescribes.
"""

from __future__ import annotations

import struct
import zlib

from datetime import datetime, timezone
from typing import Any, NamedTuple

MAX_INFLATED_SIZE = 10 * 1024 * 1024  # payloads_decoder.ex:22


class PayloadError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Minimal BSON (subset) codec
# ---------------------------------------------------------------------------


def _read_cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8"), end + 1


def decode_document(buf: bytes, pos: int = 0) -> tuple[dict[str, Any], int]:
    if len(buf) - pos < 5:
        raise PayloadError("truncated BSON document")
    (size,) = struct.unpack_from("<i", buf, pos)
    if size < 5 or pos + size > len(buf):
        raise PayloadError("bad BSON document size")
    end = pos + size - 1  # final NUL
    pos += 4
    out: dict[str, Any] = {}
    while pos < end:
        etype = buf[pos]
        pos += 1
        name, pos = _read_cstring(buf, pos)
        if etype == 0x01:  # double
            (val,) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif etype == 0x02:  # string
            (slen,) = struct.unpack_from("<i", buf, pos)
            pos += 4
            val = buf[pos : pos + slen - 1].decode("utf-8")
            pos += slen
        elif etype == 0x03:  # embedded document
            val, pos = decode_document(buf, pos)
        elif etype == 0x04:  # array -> list in key order
            doc, pos = decode_document(buf, pos)
            val = [doc[k] for k in sorted(doc, key=int)]
        elif etype == 0x05:  # binary
            (blen,) = struct.unpack_from("<i", buf, pos)
            pos += 4 + 1  # skip subtype byte
            val = bytes(buf[pos : pos + blen])
            pos += blen
        elif etype == 0x08:  # boolean
            val = buf[pos] != 0
            pos += 1
        elif etype == 0x09:  # UTC datetime (ms since epoch)
            (ms,) = struct.unpack_from("<q", buf, pos)
            pos += 8
            val = datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
        elif etype == 0x0A:  # null
            val = None
        elif etype == 0x10:  # int32
            (val,) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif etype == 0x12:  # int64
            (val,) = struct.unpack_from("<q", buf, pos)
            pos += 8
        else:
            raise PayloadError(f"unsupported BSON element type 0x{etype:02x}")
        out[name] = val
    return out, end + 1


def encode_document(doc: dict[str, Any]) -> bytes:
    """Encoder for tests/fixtures (round-trips decode_document)."""
    body = b""
    for key, val in doc.items():
        kb = key.encode("utf-8") + b"\x00"
        if isinstance(val, bool):
            body += b"\x08" + kb + (b"\x01" if val else b"\x00")
        elif isinstance(val, float):
            body += b"\x01" + kb + struct.pack("<d", val)
        elif isinstance(val, int):
            if -(2**31) <= val < 2**31:
                body += b"\x10" + kb + struct.pack("<i", val)
            else:
                body += b"\x12" + kb + struct.pack("<q", val)
        elif isinstance(val, str):
            sb = val.encode("utf-8") + b"\x00"
            body += b"\x02" + kb + struct.pack("<i", len(sb)) + sb
        elif isinstance(val, bytes):
            body += b"\x05" + kb + struct.pack("<i", len(val)) + b"\x00" + val
        elif isinstance(val, datetime):
            ms = int(val.timestamp() * 1000)
            body += b"\x09" + kb + struct.pack("<q", ms)
        elif isinstance(val, list):
            sub = encode_document({str(i): v for i, v in enumerate(val)})
            body += b"\x04" + kb + sub
        elif isinstance(val, dict):
            body += b"\x03" + kb + encode_document(val)
        elif val is None:
            body += b"\x0a" + kb
        else:
            raise PayloadError(f"cannot encode {type(val)}")
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


# ---------------------------------------------------------------------------
# Payload semantics (payloads_decoder.ex:29-62)
# ---------------------------------------------------------------------------


class DecodedPayload(NamedTuple):
    # NamedTuple, not frozen dataclass: same immutability and field
    # access, but construction is a plain tuple build instead of three
    # object.__setattr__ calls — this sits on the per-message ingest
    # hot path (one instance per data message)
    value: Any  # None == unset
    timestamp_ms: int | None  # BSON `t` if present
    metadata: dict[str, Any] | None


def decode_bson_payload(payload: bytes) -> DecodedPayload:
    """payloads_decoder.ex:29-62. Empty payload -> unset. `{v: <empty
    binary>}` -> unset. Doc without `v` but non-empty -> old-format
    object value (the whole doc). `t` is unix millis."""
    if not payload:
        return DecodedPayload(None, None, None)
    # fast path for the dominant telemetry shape `{v: <double>}`
    # (exact 16-byte layout: i32 len, 0x01 type tag, "v\0", f64,
    # terminator) — skips the generic document walker on the ingest
    # hot path; any other shape falls through unchanged
    if (
        len(payload) == 16
        and payload[4] == 0x01
        and payload[5:7] == b"v\x00"
        and payload[15] == 0
        and payload[0] == 16
        and payload[1] == payload[2] == payload[3] == 0
    ):
        return DecodedPayload(struct.unpack_from("<d", payload, 7)[0], None, None)
    doc, _ = decode_document(payload)
    if "v" in doc:
        value = doc["v"]
        if isinstance(value, bytes) and len(value) == 0:
            value = None  # unset (:43-44)
        ts = doc.get("t")
        ts_ms = int(ts.timestamp() * 1000) if isinstance(ts, datetime) else (
            int(ts) if isinstance(ts, (int, float)) else None
        )
        meta = doc.get("m") if isinstance(doc.get("m"), dict) else None
        return DecodedPayload(value, ts_ms, meta)
    if doc == {}:
        return DecodedPayload(None, None, None)
    # deprecated format: bare document = object value (:56-58)
    return DecodedPayload(doc, None, None)


def safe_inflate(data: bytes, limit: int = MAX_INFLATED_SIZE) -> bytes | None:
    """Bounded zlib inflate (payloads_decoder.ex:68-120): returns None
    on overflow or corrupt input instead of raising, like the
    reference's :error tuple."""
    d = zlib.decompressobj()
    try:
        out = d.decompress(data, limit + 1)
    except zlib.error:
        return None
    if len(out) > limit or d.unconsumed_tail:
        return None  # zip bomb or oversized (:22,81)
    return out


def parse_introspection(s: str) -> list[tuple[str, int, int]] | None:
    """payloads_decoder.ex:164-222: 'a.b.C:1:0;x.y.Z:2:3' ->
    [(name, major, minor)]; None on malformed input. Empty string is
    a valid empty introspection (:168-170)."""
    if s == "":
        return []
    out = []
    for entry in s.split(";"):
        parts = entry.split(":")
        if len(parts) != 3:
            return None
        name, major_s, minor_s = parts
        if not name or not _valid_interface_name(name):
            return None
        try:
            major, minor = int(major_s), int(minor_s)
        except ValueError:
            return None
        if major < 0 or minor < 0:
            return None
        out.append((name, major, minor))
    return out


def _valid_interface_name(name: str) -> bool:
    import re

    # reference regex (payloads_decoder.ex:183-ish): dotted reverse-DNS
    return re.fullmatch(r"[a-zA-Z][a-zA-Z0-9]*(\.[a-zA-Z0-9][a-zA-Z0-9-]*)*", name) is not None
