"""compat/protoshim mini proto3 runtime: wire-format unit tests.

The strongest check is end-to-end (test_streaming.py's
transformWithState test exchanges every message with the JVM's REAL
protobuf — a mis-serialized byte kills the state-protocol handshake);
these pin the tricky encodings in isolation so a regression names the
exact rule broken."""

from __future__ import annotations

import pytest

from irs_990_efiler_database_spark.compat.protoshim.google.protobuf.internal import (
    _mini_runtime as mr,
)


def test_varint_roundtrip_boundaries():
    for v in (0, 1, 127, 128, 300, 2**32 - 1, 2**63 - 1):
        enc = mr.encode_varint(v)
        dec, pos = mr.decode_varint(enc, 0)
        assert dec == v and pos == len(enc)


def test_negative_int_is_ten_byte_varint_and_signed_decode():
    # proto spec: negative int32/int64 encode as 64-bit two's
    # complement -> always 10 bytes on the wire
    enc = mr.encode_varint(-5)
    assert len(enc) == 10
    raw, _ = mr.decode_varint(enc, 0)
    assert mr._to_signed64(raw) == -5


def _state_message():
    from irs_990_efiler_database_spark.compat import ensure_protobuf

    ensure_protobuf()
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    return sm


def test_proto3_defaults_absent_on_wire():
    sm = _state_message()
    # all-default scalar message serializes to zero bytes
    assert sm.StateResponse().SerializeToString() == b""
    # ...but an explicitly-set empty MESSAGE field (oneof arm) travels
    req = sm.ValueStateCall(stateName="s", get=sm.Get())
    wire = req.SerializeToString()
    assert b"\x1a\x00" in wire  # field 3 (get), LEN, 0 bytes


def test_golden_wire_bytes_match_real_protobuf_layout():
    sm = _state_message()
    # golden bytes hand-derived from the proto spec (field 1, LEN,
    # "totals"); any real-protobuf implementation emits exactly this
    cmd = sm.StateCallCommand(stateName="totals")
    assert cmd.SerializeToString() == b"\x0a\x06totals"
    # enum varint: SetHandleState(state=INITIALIZED=2) -> field 1
    assert sm.SetHandleState(state=sm.INITIALIZED).SerializeToString() == b"\x08\x02"


def test_nested_auto_vivification_marks_presence():
    sm = _state_message()
    cmd = sm.StateCallCommand()
    cmd.stateName = "x"
    cmd.ttl.durationMs = 1000  # the client's exact mutation pattern
    wire = cmd.SerializeToString()
    back = sm.StateCallCommand()
    back.ParseFromString(wire)
    assert back.ttl.durationMs == 1000 and back.HasField("ttl")


def test_reading_unset_fields_does_not_mark_presence():
    """VERDICT r8 #7: reading an unset submessage (e.g. inspecting a
    oneof arm) must NOT persist it — only a write-through does. The
    old auto-vivify-on-read would emit a wrong/extra arm on the wire
    and made __eq__ access-order dependent."""
    sm = _state_message()
    cmd = sm.StateCallCommand()
    cmd.stateName = "x"
    # pure reads of unset message + repeated fields
    assert cmd.ttl.durationMs == 0
    _ = sm.StateCallCommand().SerializeToString()
    assert not cmd.HasField("ttl")
    assert cmd.SerializeToString() == b"\x0a\x01x"  # only stateName
    # __eq__ is access-order independent
    other = sm.StateCallCommand()
    other.stateName = "x"
    assert cmd == other
    # repeated read leaves no wire footprint either
    resp = sm.StateResponseWithTimer()
    _ = resp.timer
    assert resp.SerializeToString() == b""
    assert resp == sm.StateResponseWithTimer()
    # ...but the cached detached view writes through on first mutation,
    # and repeated reads return the SAME view
    view = cmd.ttl
    assert view is cmd.ttl
    view.durationMs = 77
    assert cmd.HasField("ttl") and cmd.ttl.durationMs == 77


def test_repeated_item_and_slice_writes_mark_presence():
    """ADVICE r9: every list mutator must write through presence, not
    just append/extend/insert — ``msg.sub.items[0:0] = [...]`` is a
    mutation of a detached repeated view exactly like an append."""
    sm = _state_message()
    # slice assignment on a detached repeated field attaches the chain
    resp = sm.StateResponseWithTimer()
    resp.timer[0:0] = [sm.TimerInfo(key=b"k", timestampMs=3)]
    wire = resp.SerializeToString()
    assert wire != b""
    back = sm.StateResponseWithTimer()
    back.ParseFromString(wire)
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k", 3)]
    # item assignment writes through too (list already attached here,
    # but the new value must land on the wire)
    resp.timer[0] = sm.TimerInfo(key=b"k2", timestampMs=9)
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [(b"k2", 9)]
    # del/pop/remove/clear are writes as well; an emptied repeated
    # field is absent on the wire (proto3), so the round-trip is empty
    del resp.timer[0]
    assert resp.SerializeToString() == b""
    r2 = sm.StateResponseWithListGet()
    r2.value[0:0] = [b"a", b"b"]
    r2.value.pop()
    r2.value.remove(b"a")
    assert r2.SerializeToString() == b""
    r2.value += [b"z"]
    r2.value.clear()
    assert r2.SerializeToString() == b""


def test_explicit_set_wins_over_stale_detached_view():
    sm = _state_message()
    cmd = sm.StateCallCommand()
    stale = cmd.ttl  # detached
    cmd.ttl = sm.TTLConfig(durationMs=5)
    stale.durationMs = 99  # late write through a stale view
    assert cmd.ttl.durationMs == 5  # explicit set not clobbered


def test_repeated_message_and_bytes_roundtrip():
    sm = _state_message()
    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k1", timestampMs=5),
            sm.TimerInfo(timestampMs=-7),
        ],
        requireNextFetch=True,
    )
    back = sm.StateResponseWithTimer()
    back.ParseFromString(resp.SerializeToString())
    assert [(t.key, t.timestampMs) for t in back.timer] == [
        (b"k1", 5),
        (b"", -7),
    ]
    assert back.requireNextFetch is True
    lst = sm.StateResponseWithListGet(value=[b"a", b"", b"c"])
    back2 = sm.StateResponseWithListGet()
    back2.ParseFromString(lst.SerializeToString())
    # empty bytes in a REPEATED field must survive (only singular
    # defaults are absent on the wire)
    assert list(back2.value) == [b"a", b"", b"c"]


def test_unknown_fields_skipped_not_fatal():
    sm = _state_message()
    # field 99 varint + field 98 LEN prepended to a valid message
    extra = b"\x98\x06\x2a" + b"\x92\x06\x03abc" + b"\x0a\x06totals"
    cmd = sm.StateCallCommand()
    cmd.ParseFromString(extra)
    assert cmd.stateName == "totals"


def test_unknown_kwarg_and_wrong_type_fail_loudly():
    sm = _state_message()
    with pytest.raises(ValueError):
        sm.StateCallCommand(nope=1)
    with pytest.raises(TypeError):
        sm.StateCallCommand(stateName=b"bytes-not-str")


def test_shim_never_shadows_real_protobuf(monkeypatch):
    import sys

    from irs_990_efiler_database_spark import compat

    # simulate a real protobuf being importable
    class _Fake:
        __version__ = "6.33.0"

    monkeypatch.setitem(sys.modules, "google.protobuf", _Fake())
    monkeypatch.setitem(sys.modules, "google", type(sys)("google"))
    assert compat.ensure_protobuf() == "real"
