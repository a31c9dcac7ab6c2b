"""Shim of google.protobuf.internal.builder: turns a parsed
FileDescriptor (internal.wire.parse_file_descriptor) into dynamic
message classes with wire-correct SerializeToString/ParseFromString.

Proto3 semantics implemented (the subset generated Spark code needs):
- implicit presence for scalars (defaults are not serialized);
- explicit presence for message fields — assigned (kwargs/setattr) or
  touched-through submessages (`cmd.ttl.durationMs = 0` marks `ttl`
  present, matching real protobuf) serialize even when empty;
- repeated fields as plain Python lists (non-packed emission);
- oneofs need no special handling on the wire;
- unknown fields are skipped on parse.
"""

from __future__ import annotations

from . import wire

TYPE_INT64 = 3
TYPE_UINT64 = 4
TYPE_INT32 = 5
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_UINT32 = 13
TYPE_ENUM = 14

_VARINT_TYPES = {TYPE_INT64, TYPE_UINT64, TYPE_INT32, TYPE_BOOL, TYPE_UINT32, TYPE_ENUM}
_SIGNED_TYPES = {TYPE_INT64, TYPE_INT32}
LABEL_REPEATED = 3


def _default_for(spec):
    t = spec.type
    if t == TYPE_STRING:
        return ""
    if t == TYPE_BYTES:
        return b""
    if t == TYPE_BOOL:
        return False
    return 0


class PbMessage:
    """Base for shim-generated message classes. Field values live in
    self._values; self._explicit records assigned names (presence for
    message-typed / oneof fields)."""

    _specs: tuple = ()
    _by_name: dict = {}
    _by_no: dict = {}
    _registry: dict = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_explicit", set())
        for k, v in kwargs.items():
            setattr(self, k, v)

    # -- attribute protocol -------------------------------------------------
    def __setattr__(self, name, value):
        spec = self._by_name.get(name)
        if spec is None:
            raise AttributeError(f"{type(self).__name__} has no field {name!r}")
        if spec.label == LABEL_REPEATED:
            value = list(value)
        self._values[name] = value
        self._explicit.add(name)

    def __getattr__(self, name):
        # reached only when normal lookup fails (all state is in _values)
        try:
            spec = type(self)._by_name[name]
        except KeyError:
            raise AttributeError(name) from None
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        if spec.label == LABEL_REPEATED:
            values[name] = []
            return values[name]
        if spec.type == TYPE_MESSAGE:
            inst = self._resolve(spec.type_name)()
            values[name] = inst
            return inst
        return _default_for(spec)

    @classmethod
    def _resolve(cls, type_name):
        return cls._registry[type_name]

    def _touched(self):
        if self._explicit:
            return True
        for k, v in self._values.items():
            spec = self._by_name[k]
            if spec.type == TYPE_MESSAGE and spec.label != LABEL_REPEATED:
                if v._touched():
                    return True
            elif spec.label == LABEL_REPEATED and v:
                return True
        return False

    # -- serialization ------------------------------------------------------
    def _emit_scalar(self, spec, v, out):
        t = spec.type
        if t in _VARINT_TYPES:
            out += wire.tag(spec.number, 0)
            out += wire.encode_varint(int(v))
        elif t == TYPE_STRING:
            b = v.encode("utf-8")
            out += wire.tag(spec.number, 2)
            out += wire.encode_varint(len(b))
            out += b
        elif t == TYPE_BYTES:
            b = bytes(v)
            out += wire.tag(spec.number, 2)
            out += wire.encode_varint(len(b))
            out += b
        else:
            raise TypeError(f"unsupported field type {t}")

    def SerializeToString(self) -> bytes:
        out = bytearray()
        for spec in self._specs:
            name = spec.name
            if spec.label == LABEL_REPEATED:
                for item in self._values.get(name, ()):
                    if spec.type == TYPE_MESSAGE:
                        payload = item.SerializeToString()
                        out += wire.tag(spec.number, 2)
                        out += wire.encode_varint(len(payload))
                        out += payload
                    else:
                        self._emit_scalar(spec, item, out)
            elif spec.type == TYPE_MESSAGE:
                v = self._values.get(name)
                if v is not None and (name in self._explicit or v._touched()):
                    payload = v.SerializeToString()
                    out += wire.tag(spec.number, 2)
                    out += wire.encode_varint(len(payload))
                    out += payload
            else:
                v = self._values.get(name)
                if v is None:
                    continue
                if spec.oneof_index is not None or spec.proto3_optional or (
                    v != _default_for(spec)
                ):
                    self._emit_scalar(spec, v, out)
        return bytes(out)

    # -- parsing ------------------------------------------------------------
    def ParseFromString(self, data) -> int:
        self._values.clear()
        self._explicit.clear()
        self._merge(data)
        return len(data)

    def _merge(self, data):
        for no, wt, val in wire.iter_fields(data):
            spec = self._by_no.get(no)
            if spec is None:
                continue
            if spec.type == TYPE_MESSAGE:
                inst = self._resolve(spec.type_name)()
                inst._merge(val)
                if spec.label == LABEL_REPEATED:
                    self._values.setdefault(spec.name, []).append(inst)
                else:
                    self._values[spec.name] = inst
                    self._explicit.add(spec.name)
                continue
            if spec.type == TYPE_STRING:
                v = val.decode("utf-8")
            elif spec.type == TYPE_BYTES:
                v = bytes(val)
            elif spec.type == TYPE_BOOL:
                v = bool(val)
            elif spec.type in _SIGNED_TYPES:
                v = val - (1 << 64) if val >= (1 << 63) else val
            elif spec.type in _VARINT_TYPES:
                v = val
            else:
                raise TypeError(f"unsupported field type {spec.type}")
            if spec.label == LABEL_REPEATED:
                self._values.setdefault(spec.name, []).append(v)
            else:
                self._values[spec.name] = v
                self._explicit.add(spec.name)

    def __repr__(self):  # pragma: no cover
        return f"{type(self).__name__}({self._values})"


def _make_class(msg, registry):
    specs = tuple(sorted(msg.fields, key=lambda f: f.number))
    ns = {
        "_specs": specs,
        "_by_name": {f.name: f for f in specs},
        "_by_no": {f.number: f for f in specs},
        "_registry": registry,
    }
    return type(msg.name, (PbMessage,), ns)


def BuildMessageAndEnumDescriptors(file_des, module_globals):
    """Place `_UPPERNAME` descriptor bags in the module globals (the
    generated module pokes _serialized_start/_serialized_end onto
    them)."""
    def visit(msg, prefix=""):
        module_globals["_" + (prefix + msg.name).upper()] = wire.Bag()
        for nested in msg.nested:
            visit(nested, prefix + msg.name + "_")
        for en in msg.enums:
            module_globals["_" + (prefix + msg.name + "_" + en.name).upper()] = wire.Bag()

    for msg in file_des.messages:
        visit(msg)
    for en in file_des.enums:
        module_globals["_" + en.name.upper()] = wire.Bag()


def BuildTopDescriptorsAndMessages(file_des, module_name, module_globals):
    registry = {}
    file_des.registry = registry

    def register(msg, scope_prefix):
        cls = _make_class(msg, registry)
        full = f".{file_des.package}.{scope_prefix}{msg.name}" if file_des.package else f".{scope_prefix}{msg.name}"
        registry[full] = cls
        return cls

    for msg in file_des.messages:
        cls = register(msg, "")
        module_globals[msg.name] = cls
        for nested in msg.nested:  # one level is all the shim supports
            ncls = register(nested, msg.name + ".")
            setattr(cls, nested.name, ncls)
    for en in file_des.enums:
        enum_ns = type(en.name, (), dict(en.values))
        module_globals[en.name] = enum_ns
        for vname, vnum in en.values:
            module_globals[vname] = vnum
