"""Minimal protobuf wire-format codec + FileDescriptorProto parser.

Pure-Python, built ONLY from the public protobuf encoding spec
(https://protobuf.dev/programming-guides/encoding/): varints, tags,
length-delimited fields, and the (stable, public) FileDescriptorProto
schema needed to bootstrap generated `_pb2` modules. Supports the
proto3 subset Spark's StateMessage.proto uses — singular/repeated
int32/int64/bool/string/bytes/enum/message fields and oneofs (which
are wire-format-invisible). No maps, no groups, no packed numerics.
"""

from __future__ import annotations


def encode_varint(v: int) -> bytes:
    v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf, i: int):
    shift = 0
    v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            return v, i
        if shift > 70:
            raise ValueError("varint too long")


def tag(field_no: int, wire_type: int) -> bytes:
    return encode_varint((field_no << 3) | wire_type)


def iter_fields(data):
    """Yield (field_no, wire_type, value): int for varint/fixed,
    memoryview bytes for length-delimited."""
    buf = memoryview(data)
    i = 0
    n = len(buf)
    while i < n:
        t, i = decode_varint(buf, i)
        no, wt = t >> 3, t & 7
        if wt == 0:
            v, i = decode_varint(buf, i)
        elif wt == 2:
            ln, i = decode_varint(buf, i)
            v = bytes(buf[i : i + ln])
            i += ln
        elif wt == 5:
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        elif wt == 1:
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield no, wt, v


# --------------------------------------------- FileDescriptorProto parse


class Bag:
    """Attribute bag; tolerates the `_serialized_start`-style attribute
    pokes generated modules make after building."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __repr__(self):  # pragma: no cover
        return f"Bag({self.__dict__})"


def _parse_field_descriptor(data) -> Bag:
    f = Bag(name=None, number=None, label=1, type=None, type_name=None,
            json_name=None, oneof_index=None, proto3_optional=False)
    for no, _, v in iter_fields(data):
        if no == 1:
            f.name = v.decode()
        elif no == 3:
            f.number = v
        elif no == 4:
            f.label = v
        elif no == 5:
            f.type = v
        elif no == 6:
            f.type_name = v.decode()
        elif no == 9:
            f.oneof_index = v
        elif no == 10:
            f.json_name = v.decode()
        elif no == 17:
            f.proto3_optional = bool(v)
    return f


def _parse_enum_descriptor(data) -> Bag:
    name, values = None, []
    for no, _, v in iter_fields(data):
        if no == 1:
            name = v.decode()
        elif no == 2:
            vn, vnum = None, 0
            for no2, _, v2 in iter_fields(v):
                if no2 == 1:
                    vn = v2.decode()
                elif no2 == 2:
                    vnum = v2
            values.append((vn, vnum))
    return Bag(name=name, values=values)


def _parse_message_descriptor(data) -> Bag:
    m = Bag(name=None, fields=[], oneofs=[], nested=[], enums=[])
    for no, _, v in iter_fields(data):
        if no == 1:
            m.name = v.decode()
        elif no == 2:
            m.fields.append(_parse_field_descriptor(v))
        elif no == 3:
            m.nested.append(_parse_message_descriptor(v))
        elif no == 4:
            m.enums.append(_parse_enum_descriptor(v))
        elif no == 8:
            oname = None
            for no2, _, v2 in iter_fields(v):
                if no2 == 1:
                    oname = v2.decode()
            m.oneofs.append(oname)
    return m


def parse_file_descriptor(data) -> Bag:
    fd = Bag(name=None, package="", messages=[], enums=[], syntax="proto3",
             registry=None, _loaded_options=None)
    for no, _, v in iter_fields(data):
        if no == 1:
            fd.name = v.decode()
        elif no == 2:
            fd.package = v.decode()
        elif no == 4:
            fd.messages.append(_parse_message_descriptor(v))
        elif no == 5:
            fd.enums.append(_parse_enum_descriptor(v))
        elif no == 12:
            fd.syntax = v.decode()
    return fd
