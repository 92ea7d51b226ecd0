"""Unit tests for the vendored protobuf mini-runtime (protoshim).

The e2e conformance check is the TWS parity test (the JVM parses every
request the shim encodes); these tests pin the wire-format corners
that test only exercises implicitly: negative ints, unknown-field
skipping, oneof last-write-wins, packed-varint decode, and the
bootstrap FileDescriptorProto parser. No Spark needed.
"""

import pytest

from kyiv_traffic_bigdata_spark.protoshim import (
    ensure_protobuf,
    real_protobuf_present,
)

ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_shim_never_shadows_real_protobuf():
    """ensure_protobuf only inserts the shim when no real install
    exists; with the shim active the marker attribute is visible."""
    import google.protobuf as gpb

    if real_protobuf_present():
        assert not getattr(gpb, "__is_protoshim__", False)
    else:
        assert gpb.__is_protoshim__ is True


def test_bootstrap_descriptor_parse_covers_schema():
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1
    assert d.fields_by_name["statefulProcessorCall"].number == 2
    # oneof membership resolved
    oneof_members = {
        f.name for f in d.oneofs_by_name["method"].fields
    }
    assert "timerRequest" in oneof_members
    # enum values surfaced as module constants AND on the descriptor
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.values_by_name["DATA_PROCESSED"].number == 3


def test_roundtrip_nested_autovivify_and_known_bytes():
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.ttl.durationMs = 300
    raw = cmd.SerializeToString()
    # hand-decoded canonical bytes: field1 "s", field4 msg{field1 varint 300}
    assert raw == b"\n\x01s\"\x03\x08\xac\x02"
    back = sm.StateCallCommand()
    back.ParseFromString(raw)
    assert back.stateName == "s"
    assert back.ttl.durationMs == 300
    assert back.mapStateValueSchema == ""  # absent scalar -> default


def test_negative_int64_sign_extension():
    t = sm.TimerInfo(timestampMs=-5)
    raw = t.SerializeToString()
    # negatives sign-extend to 10 varint bytes on the wire
    assert len(raw) == 11  # 1 tag byte + 10 sign-extended varint bytes
    back = sm.TimerInfo()
    back.ParseFromString(raw)
    assert back.timestampMs == -5


def test_oneof_last_write_wins_and_whichoneof():
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    assert call.WhichOneof("method") == "getValueState"
    call.getListState.stateName = "b"  # auto-vivify clears sibling
    assert call.WhichOneof("method") == "getListState"
    raw = call.SerializeToString()
    back = sm.StatefulProcessorCall()
    back.ParseFromString(raw)
    assert back.WhichOneof("method") == "getListState"
    assert back.getListState.stateName == "b"


def test_empty_oneof_message_member_still_encoded():
    """GetWatermark has zero fields; presence must survive the wire,
    otherwise the JVM cannot tell WHICH timer value was requested."""
    req = sm.TimerValueRequest(getWatermark=sm.GetWatermark())
    raw = req.SerializeToString()
    assert raw == b"\x12\x00"  # field 2, length 0
    back = sm.TimerValueRequest()
    back.ParseFromString(raw)
    assert back.WhichOneof("method") == "getWatermark"


def test_repeated_bytes_and_messages():
    r = sm.StateResponseWithMapIterator(statusCode=0)
    p = r.kvPair.add()
    p.key = b"k1"
    p.value = b"v1"
    r.kvPair.add(key=b"k2", value=b"v2")
    back = sm.StateResponseWithMapIterator()
    back.ParseFromString(r.SerializeToString())
    assert [(x.key, x.value) for x in back.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]


def test_unknown_fields_skipped():
    """Forward compat: a newer JVM adding fields must not break the
    shim's decode. Splice an unknown varint field 15 and an unknown
    length-delimited field 14 around a known field."""
    known = sm.StateResponse(statusCode=7).SerializeToString()
    unknown = b"\x78\x2a" + b"\x72\x03abc"  # field15 varint 42, field14 "abc"
    back = sm.StateResponse()
    back.ParseFromString(unknown + known)
    assert back.statusCode == 7


def test_packed_varint_decode_accepted():
    """The shim never EMITS packed scalars (schema has none), but a
    packed repeated-varint payload must still parse — build one by
    hand against a repeated bytes field's number reinterpreted?  No:
    use StateResponseWithListGet.value (repeated bytes) unpacked, and
    verify packed decode on a synthetic descriptor instead."""
    mr = pytest.importorskip("google.protobuf.internal.mini_runtime")

    fd = mr.FieldDescriptor("xs", 1, mr.TYPE_INT32, mr.LABEL_REPEATED)
    desc = mr.Descriptor("T", "t.T", [fd], [], [], [])
    cls = mr.make_message_class(desc)
    # packed: tag(1,LEN) len=3, varints 1 2 3
    msg = cls()
    msg.ParseFromString(b"\x0a\x03\x01\x02\x03")
    assert list(msg.xs) == [1, 2, 3]


def test_truncated_payload_raises():
    mr = pytest.importorskip("google.protobuf.internal.mini_runtime")

    back = sm.StateResponse()
    with pytest.raises(mr.DecodeError):
        back.ParseFromString(b"\x12\x0ax")  # claims 10 bytes, has 1


def test_unsupported_field_type_rejected_at_bootstrap():
    """The scope guard: a schema with a float field must fail loudly at
    descriptor-build time, not mis-encode at call time."""
    mr = pytest.importorskip("google.protobuf.internal.mini_runtime")

    # FileDescriptorProto with message M { double d = 1; } (type 1)
    # message_type(field 4) -> DescriptorProto{name "M", field{name "d",
    # number 1, type 1=TYPE_DOUBLE}}
    fdp = (
        b"\x22\x13"  # message_type, len 19
        b"\x0a\x01M"  # name "M"
        b"\x12\x0e"  # field, len 14
        b"\x0a\x01d"  # name "d"
        b"\x18\x01"  # number 1
        b"\x20\x01"  # label optional
        b"\x28\x01"  # type TYPE_DOUBLE
        b"\x32\x00\x52\x01d"  # type_name "", json_name "d" (padding)
    )
    with pytest.raises(mr.DecodeError, match="outside"):
        mr.parse_file_descriptor(fdp)


# ---------------------------------------------------------------------------
# Property tests: encode/decode round-trip over randomized messages
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except Exception:  # noqa: BLE001 - hypothesis is baked in, but stay import-safe
    _HAVE_HYP = False


if _HAVE_HYP:
    int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    int32s = st.integers(min_value=-(2**31), max_value=2**31 - 1)

    @st.composite
    def state_call_commands(draw):
        cmd = sm.StateCallCommand()
        if draw(st.booleans()):
            cmd.stateName = draw(st.text(max_size=20))
        if draw(st.booleans()):
            cmd.schema = draw(st.text(max_size=40))
        if draw(st.booleans()):
            cmd.ttl.durationMs = draw(int64s)
        return cmd

    @settings(max_examples=200, deadline=None)
    @given(state_call_commands())
    def test_roundtrip_property_state_call_command(cmd):
        back = sm.StateCallCommand()
        back.ParseFromString(cmd.SerializeToString())
        assert back == cmd
        # and re-encoding is byte-stable (canonical form)
        assert back.SerializeToString() == cmd.SerializeToString()

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.text(max_size=50),
        st.binary(max_size=60),
    )
    def test_roundtrip_property_state_response(code, msg, val):
        r = sm.StateResponse(statusCode=code, errorMessage=msg, value=val)
        back = sm.StateResponse()
        back.ParseFromString(r.SerializeToString())
        assert (back.statusCode, back.errorMessage, back.value) == (
            code,
            msg,
            val,
        )

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.tuples(st.binary(max_size=20), st.binary(max_size=20)),
                    max_size=10),
           st.booleans())
    def test_roundtrip_property_map_iterator_response(pairs, fetch_more):
        r = sm.StateResponseWithMapIterator(requireNextFetch=fetch_more)
        for k, v in pairs:
            r.kvPair.add(key=k, value=v)
        back = sm.StateResponseWithMapIterator()
        back.ParseFromString(r.SerializeToString())
        assert [(p.key, p.value) for p in back.kvPair] == pairs
        assert back.requireNextFetch == fetch_more

    @settings(max_examples=200, deadline=None)
    @given(int64s)
    def test_roundtrip_property_timer_sign_extension(ts):
        t = sm.RegisterTimer(expiryTimestampMs=ts)
        back = sm.RegisterTimer()
        back.ParseFromString(t.SerializeToString())
        assert back.expiryTimestampMs == ts


def test_truncated_unknown_field_raises():
    """Unknown-field skipping must not silently run past the buffer: a
    length-delimited unknown field claiming more bytes than remain is a
    decode error, not a truncated-but-accepted message."""
    mr = pytest.importorskip("google.protobuf.internal.mini_runtime")

    back = sm.StateResponse()
    with pytest.raises(mr.DecodeError):
        back.ParseFromString(b"\x72\x0ax")  # unknown field 14 claims 10 bytes


def test_reading_unset_oneof_member_preserves_active_sibling():
    """A pure READ of an unset oneof message member must not destroy
    the currently-set sibling: presence-marking and sibling-clearing
    are deferred until the attached child is written through."""
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    child = call.getListState  # read-only inspection of the other member
    assert child.stateName == ""  # default child, nothing set
    assert call.WhichOneof("method") == "getValueState"
    assert call.getValueState.stateName == "a"
    # the read-attached child still commits on its FIRST write-through
    child.stateName = "b"
    assert call.WhichOneof("method") == "getListState"


def test_orphaned_read_attached_oneof_child_does_not_resurrect():
    """Read member A (unset), set sibling B, then write through the
    orphaned A child: the parent must keep B — the detached child no
    longer belongs to the oneof."""
    call = sm.StatefulProcessorCall()
    orphan = call.getListState
    call.getValueState.stateName = "live"
    orphan.stateName = "stale"
    assert call.WhichOneof("method") == "getValueState"
    assert call.getValueState.stateName == "live"


def test_truncated_bootstrap_descriptor_raises():
    """_parse_raw must bounds-check length-delimited payloads: a
    FileDescriptorProto whose message_type claims more bytes than the
    buffer holds is a DecodeError, not a silently-short parse."""
    mr = pytest.importorskip("google.protobuf.internal.mini_runtime")

    # message_type (field 4, LEN) claiming 20 bytes with only 2 present
    with pytest.raises(mr.DecodeError, match="truncated"):
        mr.parse_file_descriptor(b"\x22\x14\x0a\x01")
    # package (field 2, string) claiming 10 bytes with 1 present
    with pytest.raises(mr.DecodeError, match="truncated"):
        mr.parse_file_descriptor(b"\x12\x0ax")
