"""Unit tests for the pure-Python protobuf wire shim
(azure_data_engineering_spark/compat/purepb) against hand-computed
golden wire bytes from the public encoding spec — the shim is what
lets the transformWithStateInPandas worker speak to the JVM state
server without a protobuf install (live engine proof:
tests/test_transform_with_state.TestLiveEngine)."""

from __future__ import annotations

import os
import sys

import pytest

_PUREPB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "azure_data_engineering_spark", "compat", "purepb",
)


@pytest.fixture(scope="module")
def sm():
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        if _PUREPB not in sys.path:
            sys.path.insert(0, _PUREPB)
    import pyspark.sql.streaming.proto.StateMessage_pb2 as stateMessage

    return stateMessage


class TestWireGolden:
    def test_nested_oneof_enum(self, sm):
        """StateRequest{statefulProcessorCall{setHandleState{state:
        INITIALIZED}}} — field 2 len-delim > field 1 len-delim >
        field 1 varint 2."""
        m = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
            )
        )
        assert m.SerializeToString().hex() == "12040a020802"

    def test_default_enum_serializes_empty_oneof_message(self, sm):
        """PRE_INIT=0 is the enum default: SetHandleState serializes
        EMPTY, but the oneof message wrapper itself must still hit the
        wire (explicit presence)."""
        m = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
            )
        )
        assert m.SerializeToString().hex() == "12020a00"

    def test_empty_oneof_message_is_emitted(self, sm):
        """removeImplicitKey=RemoveImplicitKey() carries no fields but
        must serialize as tag+len0 — the JVM dispatches on which oneof
        arm is present."""
        m = sm.StateRequest(
            implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                removeImplicitKey=sm.RemoveImplicitKey()
            )
        )
        assert m.SerializeToString().hex() == "22021200"

    def test_string_and_bytes_fields(self, sm):
        m = sm.SetImplicitKey(key=b"\x01\x02")
        assert m.SerializeToString().hex() == "0a020102"
        c = sm.StateCallCommand(stateName="s", schema="j")
        assert c.SerializeToString().hex() == "0a01731201_6a".replace("_", "")

    def test_touched_submessage_presence(self, sm):
        """cmd.ttl.durationMs = 0: value is the default (emits
        nothing), but touching the submessage marks it present —
        real-protobuf semantics."""
        c = sm.StateCallCommand()
        c.stateName = "s"
        c.ttl.durationMs = 0
        assert c.SerializeToString().hex() == "0a01732200"
        c2 = sm.StateCallCommand()
        c2.stateName = "s"
        _ = c2.ttl.durationMs  # pure read: must NOT create presence
        assert c2.SerializeToString().hex() == "0a0173"

    def test_int64_varint_and_negative(self, sm):
        m = sm.RegisterTimer(expiryTimestampMs=300)
        assert m.SerializeToString().hex() == "08ac02"
        n = sm.RegisterTimer(expiryTimestampMs=-1)
        data = n.SerializeToString()
        # -1 sign-extends to ten 0xff..0x01 varint bytes
        assert data.hex() == "08" + "ff" * 9 + "01"
        back = sm.RegisterTimer()
        back.ParseFromString(data)
        assert back.expiryTimestampMs == -1

    def test_parse_with_unknown_fields_skipped(self, sm):
        """statusCode=1 + an unknown field 9 (varint) + value=abc:
        unknown skipped, knowns parsed."""
        payload = bytes.fromhex("0801" + "4807" + "1a03616263")
        r = sm.StateResponse()
        r.ParseFromString(payload)
        assert r.statusCode == 1 and r.value == b"abc" and r.errorMessage == ""

    def test_repeated_bytes_and_bool(self, sm):
        payload = bytes.fromhex("0800" + "1a0161" + "1a0162" + "2001")
        r = sm.StateResponseWithListGet()
        r.ParseFromString(payload)
        assert list(r.value) == [b"a", b"b"]
        assert r.requireNextFetch is True

    def test_repeated_message_parse(self, sm):
        """StateResponseWithTimer with two TimerInfo entries."""
        t1 = bytes.fromhex("0a016b" + "10ac02")  # key=b"k", timestampMs=300
        t2 = bytes.fromhex("1064")  # timestampMs=100, no key
        payload = (
            bytes.fromhex("0800")
            + bytes.fromhex("1a") + bytes([len(t1)]) + t1
            + bytes.fromhex("1a") + bytes([len(t2)]) + t2
        )
        r = sm.StateResponseWithTimer()
        r.ParseFromString(payload)
        assert len(r.timer) == 2
        assert r.timer[0].key == b"k" and r.timer[0].timestampMs == 300
        assert r.timer[1].key == b"" and r.timer[1].timestampMs == 100

    def test_roundtrip_every_request_arm(self, sm):
        """Serialize-parse round trip across the request oneof arms
        the state clients actually send."""
        msgs = [
            sm.StateRequest(
                statefulProcessorCall=sm.StatefulProcessorCall(
                    getValueState=sm.StateCallCommand(stateName="v", schema="s")
                )
            ),
            sm.StateRequest(
                stateVariableRequest=sm.StateVariableRequest(
                    valueStateCall=sm.ValueStateCall(
                        stateName="v",
                        valueStateUpdate=sm.ValueStateUpdate(value=b"xy"),
                    )
                )
            ),
            sm.StateRequest(
                implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                    setImplicitKey=sm.SetImplicitKey(key=b"gk")
                )
            ),
            sm.StateRequest(
                timerRequest=sm.TimerRequest(
                    expiryTimerRequest=sm.ExpiryTimerRequest(
                        iteratorId="it", expiryTimestampMs=7
                    )
                )
            ),
            sm.StateRequest(
                utilsRequest=sm.UtilsRequest(
                    parseStringSchema=sm.ParseStringSchema(schema="a INT")
                )
            ),
        ]
        for m in msgs:
            data = m.SerializeToString()
            back = sm.StateRequest()
            back.ParseFromString(data)
            assert back.SerializeToString() == data


class TestTimerWireGolden:
    """Golden wire bytes for the TIMER protocol messages — the half of
    the TWS API SessionTimeoutProcessor drives (register / delete /
    list on the handle; expiry iteration from the engine). Byte
    layouts hand-derived from the public encoding spec; the same
    bytes are what the live timer run (TestLiveTimers) exchanged with
    the JVM state server."""

    def test_register_timer(self, sm):
        m = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                timerStateCall=sm.TimerStateCallCommand(
                    register=sm.RegisterTimer(expiryTimestampMs=62_000)
                )
            )
        )
        # field2> field5> field1> {field1 varint 62000 = b0 e4 03}
        assert m.SerializeToString().hex() == "12082a060a0408b0e403"

    def test_delete_timer(self, sm):
        m = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                timerStateCall=sm.TimerStateCallCommand(
                    delete=sm.DeleteTimer(expiryTimestampMs=62_000)
                )
            )
        )
        assert m.SerializeToString().hex() == "12082a06120408b0e403"

    def test_list_timers(self, sm):
        m = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                timerStateCall=sm.TimerStateCallCommand(
                    list=sm.ListTimers(iteratorId="it1")
                )
            )
        )
        assert m.SerializeToString().hex() == "12092a071a050a03697431"

    def test_expiry_timer_request(self, sm):
        m = sm.StateRequest(
            timerRequest=sm.TimerRequest(
                expiryTimerRequest=sm.ExpiryTimerRequest(
                    expiryTimestampMs=1_070_000
                )
            )
        )
        # field5> field2> {field2 varint 1070000 = b0 a7 41}
        assert m.SerializeToString().hex() == "2a06120410b0a741"

    def test_timer_roundtrip(self, sm):
        for ms in (0, 1, 62_000, 2**40):
            m = sm.StateRequest(
                statefulProcessorCall=sm.StatefulProcessorCall(
                    timerStateCall=sm.TimerStateCallCommand(
                        register=sm.RegisterTimer(expiryTimestampMs=ms)
                    )
                )
            )
            back = sm.StateRequest()
            back.ParseFromString(m.SerializeToString())
            assert back.SerializeToString() == m.SerializeToString()
