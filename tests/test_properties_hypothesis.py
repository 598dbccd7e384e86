"""Property-based invariants of the per-device state machine.

The reference has no randomized testing; these pin the algebraic
properties the Spark execution model depends on:

- redelivery idempotence: processing a message list with duplicated
  message_ids equals processing the unique list (A3 — at-least-once
  delivery must collapse to exactly-once effects).
- counter conservation: total_received_msgs equals the number of
  unique counted messages regardless of arrival order.
- property LWW: the final property value equals the value of the
  latest set (by reception timestamp) not followed by an unset —
  independent of physical arrival order, because the fold sorts.
"""

from __future__ import annotations

import copy
from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from astarte_data_updater_plant_spark.catalog import fixture_interfaces
from astarte_data_updater_plant_spark.functions.payloads import encode_document
from astarte_data_updater_plant_spark.streaming.state_machine import (
    Catalog,
    DeviceState,
    process_device_messages,
)

T0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
CATALOG = Catalog(fixture_interfaces())
INTRO = b"com.test.LCDMonitor:1:0;com.test.SimpleStreamTest:1:0"


def _msg(i: int, kind: str, value=None) -> dict:
    base = dict(
        realm="r",
        device_id="d",
        message_id=f"m{i:05d}",
        reception_timestamp=T0 + timedelta(seconds=i),
        ip_address=None,
        interface=None,
        path=None,
        payload=None,
    )
    if kind == "intro":
        return dict(base, msg_type="introspection", payload=INTRO)
    if kind == "data":
        return dict(
            base,
            msg_type="data",
            interface="com.test.SimpleStreamTest",
            path="/0/value",
            payload=encode_document({"v": int(value)}),
        )
    if kind == "prop":
        return dict(
            base,
            msg_type="data",
            interface="com.test.LCDMonitor",
            path="/time/from",
            payload=encode_document({"v": int(value)}) if value is not None else b"",
        )
    raise AssertionError(kind)


def _run(msgs: list[dict]):
    state = DeviceState(realm="r", device_id="d")
    out = process_device_messages(state, CATALOG, copy.deepcopy(msgs))
    return state, out


@st.composite
def message_lists(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    msgs = [_msg(0, "intro")]
    for i in range(1, n + 1):
        kind = draw(st.sampled_from(["data", "prop", "prop_unset"]))
        if kind == "data":
            msgs.append(_msg(i, "data", draw(st.integers(-1000, 1000))))
        elif kind == "prop":
            msgs.append(_msg(i, "prop", draw(st.integers(-1000, 1000))))
        else:
            msgs.append(_msg(i, "prop", None))
    return msgs


@settings(max_examples=60, deadline=None)
@given(message_lists(), st.randoms())
def test_redelivery_idempotence(msgs, rng):
    """once == once-with-random-redeliveries (same final state and
    identical effect rows)."""
    doubled = msgs + [copy.deepcopy(m) for m in msgs if rng.random() < 0.5]
    rng.shuffle(doubled)
    s1, o1 = _run(msgs)
    s2, o2 = _run(doubled)
    assert s1 == s2
    key = lambda r: repr(sorted(r.items(), key=lambda kv: kv[0]))
    assert sorted(map(key, o1.datastream_rows)) == sorted(map(key, o2.datastream_rows))
    assert sorted(map(key, o1.property_upserts)) == sorted(map(key, o2.property_upserts))
    assert sorted(map(key, o1.property_deletes)) == sorted(map(key, o2.property_deletes))


@settings(max_examples=60, deadline=None)
@given(message_lists(), st.randoms())
def test_arrival_order_independence(msgs, rng):
    """The fold sorts by (reception_timestamp, message_id), so any
    physical arrival order produces identical state and effects."""
    shuffled = copy.deepcopy(msgs)
    rng.shuffle(shuffled)
    s1, o1 = _run(msgs)
    s2, o2 = _run(shuffled)
    assert s1 == s2
    assert o1.datastream_rows == o2.datastream_rows
    assert [e["event_type"] for e in o1.events] == [e["event_type"] for e in o2.events]


@settings(max_examples=60, deadline=None)
@given(message_lists())
def test_counters_and_lww(msgs):
    state, out = _run(msgs)
    counted = [m for m in msgs if m["msg_type"] in ("introspection", "data")]
    assert state.total_received_msgs == len(counted)
    assert state.total_received_bytes == sum(len(m["payload"] or b"") for m in counted)
    # LWW: reconstruct expected /time/from value from the sorted log
    expected = None
    for m in sorted(msgs, key=lambda m: (m["reception_timestamp"], m["message_id"])):
        if m["msg_type"] == "data" and m["path"] == "/time/from":
            from astarte_data_updater_plant_spark.functions.payloads import (
                decode_bson_payload,
            )

            expected = decode_bson_payload(m["payload"]).value
    got = state.properties.get(("com.test.LCDMonitor", "/time/from"))
    assert got == expected
    # datastream rows: exactly one per unique data message
    n_data = sum(1 for m in msgs if m["msg_type"] == "data"
                 and m["interface"] == "com.test.SimpleStreamTest")
    assert len(out.datastream_rows) == n_data


# ---------------------------------------------------------------------------
# _dumps fast-path byte-identity (the r7 ingest-fold JSON encoder)
# ---------------------------------------------------------------------------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=True, allow_infinity=True),
    st.text(max_size=40),
    st.datetimes(
        min_value=datetime(1971, 1, 1),
        max_value=datetime(2200, 1, 1),
        timezones=st.just(timezone.utc) | st.none(),
    ),
    st.binary(max_size=16),
    st.dictionaries(st.text(max_size=8), st.integers(), max_size=3),
    st.lists(st.integers(), max_size=3),
)


@settings(max_examples=300, deadline=None)
@given(st.dictionaries(st.text(max_size=24), _json_scalars, max_size=10))
def test_fast_dumps_byte_identical_to_stdlib(d):
    """pipeline._dumps (the hand-rolled flat-dict hot path with its
    nested/bytes/non-finite stdlib fallback) must emit EXACTLY the
    stdlib encoding for every value shape an output row can carry —
    sorted keys, ', '/': ' separators, ensure_ascii escapes, float
    repr, isoformat datetimes, b64 bytes, dropped Nones."""
    from astarte_data_updater_plant_spark.streaming.pipeline import (
        _dumps,
        _dumps_std,
    )

    assert _dumps(d) == _dumps_std(d)


_any_key = st.one_of(
    st.text(max_size=12),
    st.integers(-100, 100),
    st.booleans(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.none(),
)


@settings(max_examples=200, deadline=None)
@given(st.dictionaries(_any_key, _json_scalars, max_size=8))
def test_fast_dumps_non_str_keys_match_stdlib(d):
    """Non-str dict keys (impossible for real output rows) must not
    diverge from stdlib: json.dumps coerces int/float/bool/None keys
    to strings but raises TypeError on a mixed-type key sort — the
    fast path has to do exactly the same thing, via fallback, never
    raise where stdlib succeeds or emit different bytes (ADVICE r7)."""
    from astarte_data_updater_plant_spark.streaming.pipeline import (
        _dumps,
        _dumps_std,
    )

    try:
        expected = _dumps_std(d)
    except TypeError:
        import pytest

        with pytest.raises(TypeError):
            _dumps(d)
        return
    assert _dumps(d) == expected
