"""Minimal pure-Python protobuf runtime for the TWS wire protocol.

Implements just enough of the public Protocol Buffers wire format
(https://protobuf.dev/programming-guides/encoding/) and generated-code
API to let PySpark's generated ``StateMessage_pb2`` module build and
exchange messages with the JVM side of ``transformWithStateInPandas``.
This sandbox has no pip and no ``google.protobuf``; the official
generated module only touches the runtime through four entry points
(``descriptor_pool.Default().AddSerializedFile``,
``builder.BuildMessageAndEnumDescriptors``,
``builder.BuildTopDescriptorsAndMessages``, and a version check), so a
shim that owns those entry points can supply its own message classes.

Scope (deliberate, asserted at parse time):
- field types: int32, int64, bool, enum (varint); string, bytes,
  message (length-delimited). No floats, fixed*, sint*, groups or maps
  — the StateMessage schema uses none of them.
- repeated fields are never packed on encode (matches protoc for
  bytes/string/message, the only repeated types in the schema);
  packed varints are still ACCEPTED on decode for safety.
- presence: proto3 semantics. Scalars outside oneofs encode only when
  != default; message fields and oneof members encode when set. One
  documented deviation: READING an unset singular message field
  attaches it to the parent (so ``cmd.ttl.durationMs = 5`` works, the
  only pattern PySpark's client uses), whereas real protobuf keeps the
  child detached until written through.

The wire format is standards-driven: bytes produced here are canonical
protobuf the JVM parser verifies on every TWS round-trip (the e2e test
is the conformance check).
"""

from __future__ import annotations

# --------------------------------------------------------------------------
# Wire-format primitives
# --------------------------------------------------------------------------

_WIRE_VARINT = 0
_WIRE_FIXED64 = 1
_WIRE_LEN = 2
_WIRE_FIXED32 = 5

# FieldDescriptorProto.Type values (public descriptor.proto numbering)
TYPE_INT64 = 3
TYPE_INT32 = 5
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_ENUM = 14

_VARINT_TYPES = frozenset({TYPE_INT64, TYPE_INT32, TYPE_BOOL, TYPE_ENUM})
_LEN_TYPES = frozenset({TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE})

LABEL_REPEATED = 3


def write_varint(buf: bytearray, value: int) -> None:
    """Append ``value`` as a base-128 varint (negatives sign-extended
    to 64 bits, the proto2/3 int32/int64 convention)."""
    value &= 0xFFFFFFFFFFFFFFFF
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            buf.append(bits | 0x80)
        else:
            buf.append(bits)
            return


def read_varint(data: bytes, pos: int) -> tuple[int, int]:
    """Decode a varint at ``pos``; returns (unsigned value, new pos)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise DecodeError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise DecodeError("varint too long")


def _to_signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def _skip_field(data: bytes, pos: int, wire_type: int) -> int:
    if wire_type == _WIRE_VARINT:
        _, pos = read_varint(data, pos)
    elif wire_type == _WIRE_FIXED64:
        pos += 8
    elif wire_type == _WIRE_LEN:
        n, pos = read_varint(data, pos)
        pos += n
    elif wire_type == _WIRE_FIXED32:
        pos += 4
    else:
        raise DecodeError(f"cannot skip wire type {wire_type}")
    if pos > len(data):
        raise DecodeError("truncated unknown field")
    return pos


class Error(Exception):
    pass


class DecodeError(Error):
    pass


class EncodeError(Error):
    pass


# --------------------------------------------------------------------------
# Descriptor model (duck-typed subset of google.protobuf.descriptor)
# --------------------------------------------------------------------------


class FieldDescriptor:
    # re-export the type constants under the names generated code and
    # user code expect on the class
    TYPE_INT64 = TYPE_INT64
    TYPE_INT32 = TYPE_INT32
    TYPE_BOOL = TYPE_BOOL
    TYPE_STRING = TYPE_STRING
    TYPE_MESSAGE = TYPE_MESSAGE
    TYPE_BYTES = TYPE_BYTES
    TYPE_ENUM = TYPE_ENUM
    LABEL_OPTIONAL = 1
    LABEL_REQUIRED = 2
    LABEL_REPEATED = 3

    def __init__(self, name, number, type_, label, type_name="",
                 oneof_index=None, json_name=""):
        self.name = name
        self.number = number
        self.type = type_
        self.label = label
        self.type_name = type_name  # fully-qualified, leading dot
        self.oneof_index = oneof_index
        self.json_name = json_name or name
        self.message_type = None  # resolved Descriptor for TYPE_MESSAGE
        self.enum_type = None
        self.containing_type = None
        self.containing_oneof = None

    @property
    def is_repeated(self) -> bool:
        return self.label == LABEL_REPEATED

    def default(self):
        if self.is_repeated:
            return []
        if self.type in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
            return 0
        if self.type == TYPE_BOOL:
            return False
        if self.type == TYPE_STRING:
            return ""
        if self.type == TYPE_BYTES:
            return b""
        return None  # message: absent


class OneofDescriptor:
    def __init__(self, name):
        self.name = name
        self.fields: list[FieldDescriptor] = []
        self.containing_type = None


class EnumValueDescriptor:
    def __init__(self, name, number):
        self.name = name
        self.number = number


class EnumDescriptor:
    def __init__(self, name, full_name, values):
        self.name = name
        self.full_name = full_name
        self.values = values
        self.values_by_name = {v.name: v for v in values}
        self.values_by_number = {v.number: v for v in values}
        # generated modules assign these after building
        self._serialized_start = None
        self._serialized_end = None
        self._loaded_options = None


class Descriptor:
    def __init__(self, name, full_name, fields, oneofs, nested_types,
                 enum_types):
        self.name = name
        self.full_name = full_name
        self.fields = fields
        self.fields_by_name = {f.name: f for f in fields}
        self.fields_by_number = {f.number: f for f in fields}
        self.oneofs = oneofs
        self.oneofs_by_name = {o.name: o for o in oneofs}
        self.nested_types = nested_types
        self.nested_types_by_name = {d.name: d for d in nested_types}
        self.enum_types = enum_types
        self.enum_types_by_name = {e.name: e for e in enum_types}
        self._concrete_class = None
        self._serialized_start = None
        self._serialized_end = None
        self._loaded_options = None
        for f in fields:
            f.containing_type = self
        for o in oneofs:
            o.containing_type = self


class FileDescriptor:
    def __init__(self, name, package, message_types, enum_types,
                 serialized_pb):
        self.name = name
        self.package = package
        self.message_types_by_name = {d.name: d for d in message_types}
        self.enum_types_by_name = {e.name: e for e in enum_types}
        self.serialized_pb = serialized_pb
        self._loaded_options = None


# --------------------------------------------------------------------------
# Bootstrap: parse a serialized FileDescriptorProto
# --------------------------------------------------------------------------
# FileDescriptorProto is itself a protobuf message, so the pool's
# AddSerializedFile input is decoded with a hand-written schema of the
# public descriptor.proto field numbers (the subset protoc emits for a
# flat proto3 file: no extensions, services, or options we care about).

_FIELD_DP = {
    1: ("name", "string"),
    3: ("number", "varint"),
    4: ("label", "varint"),
    5: ("type", "varint"),
    6: ("type_name", "string"),
    9: ("oneof_index", "varint"),
    10: ("json_name", "string"),
    17: ("proto3_optional", "varint"),
}
_ENUM_VALUE_DP = {1: ("name", "string"), 2: ("number", "varint")}
_ENUM_DP = {1: ("name", "string"), 2: ("value", "msg*", _ENUM_VALUE_DP)}
_ONEOF_DP = {1: ("name", "string")}
_MESSAGE_DP: dict = {
    1: ("name", "string"),
    2: ("field", "msg*", _FIELD_DP),
    4: ("enum_type", "msg*", _ENUM_DP),
    8: ("oneof_decl", "msg*", _ONEOF_DP),
}
_MESSAGE_DP[3] = ("nested_type", "msg*", _MESSAGE_DP)  # recursive
_FILE_DP = {
    1: ("name", "string"),
    2: ("package", "string"),
    4: ("message_type", "msg*", _MESSAGE_DP),
    5: ("enum_type", "msg*", _ENUM_DP),
    12: ("syntax", "string"),
}


def _parse_raw(data: bytes, schema: dict) -> dict:
    """Generic schema-driven decode into plain dicts/lists."""
    out: dict = {}
    pos = 0
    while pos < len(data):
        tag, pos = read_varint(data, pos)
        number, wire_type = tag >> 3, tag & 7
        spec = schema.get(number)
        if spec is None:
            pos = _skip_field(data, pos, wire_type)
            continue
        name, kind = spec[0], spec[1]
        if kind == "varint":
            value, pos = read_varint(data, pos)
            out[name] = _to_signed64(value)
        elif kind == "string":
            n, pos = read_varint(data, pos)
            if pos + n > len(data):
                raise DecodeError(f"field {name}: truncated payload")
            out[name] = data[pos : pos + n].decode("utf-8")
            pos += n
        elif kind == "msg*":
            n, pos = read_varint(data, pos)
            if pos + n > len(data):
                raise DecodeError(f"field {name}: truncated payload")
            sub = _parse_raw(data[pos : pos + n], spec[2])
            pos += n
            out.setdefault(name, []).append(sub)
        else:  # pragma: no cover - schema is static
            raise DecodeError(f"bad bootstrap kind {kind}")
    return out


def _build_enum(raw: dict, prefix: str) -> EnumDescriptor:
    values = [
        EnumValueDescriptor(v["name"], v.get("number", 0))
        for v in raw.get("value", [])
    ]
    return EnumDescriptor(raw["name"], f"{prefix}.{raw['name']}", values)


def _build_message(raw: dict, prefix: str) -> Descriptor:
    full = f"{prefix}.{raw['name']}"
    oneofs = [OneofDescriptor(o["name"]) for o in raw.get("oneof_decl", [])]
    fields = []
    for fr in raw.get("field", []):
        ftype = fr.get("type", 0)
        if ftype not in _VARINT_TYPES | _LEN_TYPES:
            raise DecodeError(
                f"field {full}.{fr.get('name')} has type {ftype}, outside "
                "the mini-runtime's supported subset"
            )
        fd = FieldDescriptor(
            fr["name"],
            fr["number"],
            ftype,
            fr.get("label", 1),
            fr.get("type_name", ""),
            fr.get("oneof_index"),
            fr.get("json_name", ""),
        )
        if fd.oneof_index is not None and fd.oneof_index < len(oneofs):
            fd.containing_oneof = oneofs[fd.oneof_index]
            oneofs[fd.oneof_index].fields.append(fd)
        fields.append(fd)
    nested = [_build_message(m, full) for m in raw.get("nested_type", [])]
    enums = [_build_enum(e, full) for e in raw.get("enum_type", [])]
    return Descriptor(raw["name"], full, fields, oneofs, nested, enums)


def parse_file_descriptor(serialized: bytes) -> FileDescriptor:
    raw = _parse_raw(serialized, _FILE_DP)
    package = raw.get("package", "")
    messages = [
        _build_message(m, package) for m in raw.get("message_type", [])
    ]
    enums = [_build_enum(e, package) for e in raw.get("enum_type", [])]
    fd = FileDescriptor(
        raw.get("name", ""), package, messages, enums, serialized
    )
    _resolve_type_refs(fd)
    return fd


def _walk_messages(descriptors):
    for d in descriptors:
        yield d
        yield from _walk_messages(d.nested_types)


def _resolve_type_refs(fd: FileDescriptor) -> None:
    by_full: dict[str, Descriptor] = {}
    enums_by_full: dict[str, EnumDescriptor] = {}
    for d in _walk_messages(fd.message_types_by_name.values()):
        by_full[d.full_name] = d
        for e in d.enum_types:
            enums_by_full[e.full_name] = e
    for e in fd.enum_types_by_name.values():
        enums_by_full[e.full_name] = e
    for d in by_full.values():
        for f in d.fields:
            if not f.type_name:
                continue
            ref = f.type_name.lstrip(".")
            if f.type == TYPE_MESSAGE:
                f.message_type = by_full[ref]
            elif f.type == TYPE_ENUM:
                f.enum_type = enums_by_full[ref]


# --------------------------------------------------------------------------
# Repeated-field containers
# --------------------------------------------------------------------------


class RepeatedScalarFieldContainer(list):
    """List with protobuf's container name; accepts extend/append.

    ``on_mutate`` fires once on the first append/extend so a container
    owned by a lazily-attached oneof sub-message can commit its owner
    (see :meth:`MiniMessage.__getattr__`)."""

    def __init__(self, values=(), on_mutate=None):
        super().__init__(values)
        self._on_mutate = on_mutate

    def _fire(self):
        cb, self._on_mutate = self._on_mutate, None
        if cb is not None:
            cb()

    def append(self, value):
        super().append(value)
        self._fire()

    def extend(self, values):
        super().extend(values)
        self._fire()

    def add(self):  # pragma: no cover - scalar containers have no add()
        raise TypeError("add() only exists on composite containers")


class RepeatedCompositeFieldContainer(list):
    def __init__(self, message_class, values=(), on_mutate=None):
        super().__init__(values)
        self._message_class = message_class
        self._on_mutate = on_mutate

    def _fire(self):
        cb, self._on_mutate = self._on_mutate, None
        if cb is not None:
            cb()

    def append(self, value):
        super().append(value)
        self._fire()

    def extend(self, values):
        super().extend(values)
        self._fire()

    def add(self, **kwargs):
        msg = self._message_class(**kwargs)
        self.append(msg)
        return msg


# --------------------------------------------------------------------------
# Message implementation
# --------------------------------------------------------------------------


class MiniMessage:
    """Base for generated message classes (DESCRIPTOR on subclass)."""

    DESCRIPTOR: Descriptor = None  # set by make_message_class

    __slots__ = ("_values", "_present", "_listener")

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_present", set())
        object.__setattr__(self, "_listener", None)
        for name, value in kwargs.items():
            if value is None:
                continue
            fd = self.DESCRIPTOR.fields_by_name.get(name)
            if fd is None:
                raise ValueError(
                    f"{self.DESCRIPTOR.full_name} has no field {name!r}"
                )
            if fd.is_repeated:
                self._repeated(fd).extend(value)
                self._present.add(name)
                self._clear_oneof_siblings(fd)
            else:
                self._set_scalar_or_message(fd, value)

    # -- attribute protocol -------------------------------------------------

    def __getattr__(self, name):
        # __slots__ means only field names reach here
        desc = type(self).DESCRIPTOR
        fd = desc.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f"{desc.full_name} has no field {name!r}"
            )
        values = object.__getattribute__(self, "_values")
        if fd.is_repeated:
            if name not in values:
                values[name] = self._fresh_container(fd)
            return values[name]
        if fd.type == TYPE_MESSAGE:
            if name not in values:
                # documented deviation: attach on read so
                # ``parent.child.field = x`` mutates the parent. For a
                # oneof member, presence-marking and sibling-clearing
                # are DEFERRED until the attached child is actually
                # written through (protobuf's listener semantics) — a
                # pure read must never destroy the active sibling.
                child = fd.message_type._concrete_class()
                values[name] = child
                if fd.containing_oneof is None:
                    self._present.add(name)
                    commit = self._mark_modified
                else:
                    def commit(self=self, name=name, fd=fd, child=child):
                        # skip if the child was orphaned by a sibling
                        # set between the read and this first write
                        if self._values.get(name) is child:
                            self._present.add(name)
                            self._clear_oneof_siblings(fd)
                            self._mark_modified()
                object.__setattr__(child, "_listener", commit)
            return values[name]
        return values.get(name, fd.default())

    def _mark_modified(self):
        """Fire-once write-through hook: commits a lazily read-attached
        sub-message into its parent (presence + oneof sibling clear)."""
        listener = object.__getattribute__(self, "_listener")
        if listener is not None:
            object.__setattr__(self, "_listener", None)
            listener()

    def __setattr__(self, name, value):
        fd = type(self).DESCRIPTOR.fields_by_name.get(name)
        if fd is None:
            raise AttributeError(
                f"{type(self).DESCRIPTOR.full_name} has no field {name!r}"
            )
        if fd.is_repeated:
            container = self._fresh_container(fd)
            container.extend(value)
            self._values[name] = container
            self._present.add(name)
        else:
            self._set_scalar_or_message(fd, value)

    def _fresh_container(self, fd):
        if fd.type == TYPE_MESSAGE:
            return RepeatedCompositeFieldContainer(
                fd.message_type._concrete_class,
                on_mutate=self._mark_modified,
            )
        return RepeatedScalarFieldContainer(on_mutate=self._mark_modified)

    def _repeated(self, fd):
        if fd.name not in self._values:
            self._values[fd.name] = self._fresh_container(fd)
        return self._values[fd.name]

    def _set_scalar_or_message(self, fd, value):
        if fd.type == TYPE_MESSAGE:
            if not isinstance(value, MiniMessage):
                raise TypeError(
                    f"{fd.name} expects a message, got {type(value)!r}"
                )
        elif fd.type == TYPE_STRING:
            if not isinstance(value, str):
                raise TypeError(f"{fd.name} expects str")
        elif fd.type == TYPE_BYTES:
            if isinstance(value, (bytearray, memoryview)):
                value = bytes(value)
            if not isinstance(value, bytes):
                raise TypeError(f"{fd.name} expects bytes")
        elif fd.type == TYPE_BOOL:
            value = bool(value)
        else:
            value = int(value)
        self._values[fd.name] = value
        self._present.add(fd.name)
        self._clear_oneof_siblings(fd)
        self._mark_modified()

    def _clear_oneof_siblings(self, fd):
        if fd.containing_oneof is None:
            return
        for sibling in fd.containing_oneof.fields:
            if sibling.name != fd.name:
                self._values.pop(sibling.name, None)
                self._present.discard(sibling.name)

    # -- protobuf public API -------------------------------------------------

    def HasField(self, name):  # noqa: N802 - protobuf API name
        fd = self.DESCRIPTOR.fields_by_name.get(name)
        if fd is None or fd.is_repeated:
            raise ValueError(f"bad HasField argument {name!r}")
        return name in self._present

    def WhichOneof(self, oneof_name):  # noqa: N802
        oneof = self.DESCRIPTOR.oneofs_by_name[oneof_name]
        for f in oneof.fields:
            if f.name in self._present:
                return f.name
        return None

    def Clear(self):  # noqa: N802
        self._values.clear()
        self._present.clear()

    def CopyFrom(self, other):  # noqa: N802
        self.Clear()
        self.MergeFromString(other.SerializeToString())

    def SerializeToString(self, **_kwargs):  # noqa: N802
        buf = bytearray()
        for fd in sorted(self.DESCRIPTOR.fields, key=lambda f: f.number):
            if fd.is_repeated:
                for item in self._values.get(fd.name, ()):
                    self._encode_one(buf, fd, item)
                continue
            if fd.type == TYPE_MESSAGE or fd.containing_oneof is not None:
                if fd.name in self._present:
                    self._encode_one(buf, fd, self._values[fd.name])
                continue
            value = self._values.get(fd.name)
            if value is not None and value != fd.default():
                self._encode_one(buf, fd, value)
        return bytes(buf)

    @staticmethod
    def _encode_one(buf, fd, value):
        if fd.type in _VARINT_TYPES:
            write_varint(buf, fd.number << 3 | _WIRE_VARINT)
            write_varint(buf, int(value))
            return
        if fd.type == TYPE_STRING:
            payload = value.encode("utf-8")
        elif fd.type == TYPE_BYTES:
            payload = bytes(value)
        else:  # message
            payload = value.SerializeToString()
        write_varint(buf, fd.number << 3 | _WIRE_LEN)
        write_varint(buf, len(payload))
        buf += payload

    def ParseFromString(self, data):  # noqa: N802
        self.Clear()
        return self.MergeFromString(data)

    def MergeFromString(self, data):  # noqa: N802
        data = bytes(data)
        pos = 0
        end = len(data)
        by_number = self.DESCRIPTOR.fields_by_number
        while pos < end:
            tag, pos = read_varint(data, pos)
            number, wire_type = tag >> 3, tag & 7
            fd = by_number.get(number)
            if fd is None:
                pos = _skip_field(data, pos, wire_type)
                continue
            if fd.type in _VARINT_TYPES:
                if wire_type == _WIRE_LEN and fd.is_repeated:
                    # packed varints (accepted though never produced)
                    n, pos = read_varint(data, pos)
                    stop = pos + n
                    while pos < stop:
                        raw, pos = read_varint(data, pos)
                        self._store_decoded(fd, self._coerce(fd, raw))
                    continue
                if wire_type != _WIRE_VARINT:
                    raise DecodeError(
                        f"field {fd.name}: wire type {wire_type} for varint"
                    )
                raw, pos = read_varint(data, pos)
                self._store_decoded(fd, self._coerce(fd, raw))
            else:
                if wire_type != _WIRE_LEN:
                    raise DecodeError(
                        f"field {fd.name}: wire type {wire_type} for "
                        "length-delimited"
                    )
                n, pos = read_varint(data, pos)
                if pos + n > end:
                    raise DecodeError(f"field {fd.name}: truncated payload")
                chunk = data[pos : pos + n]
                pos += n
                if fd.type == TYPE_STRING:
                    self._store_decoded(fd, chunk.decode("utf-8"))
                elif fd.type == TYPE_BYTES:
                    self._store_decoded(fd, chunk)
                else:
                    msg = fd.message_type._concrete_class()
                    msg.MergeFromString(chunk)
                    self._store_decoded(fd, msg)
        return len(data)

    @staticmethod
    def _coerce(fd, raw):
        if fd.type == TYPE_BOOL:
            return bool(raw)
        return _to_signed64(raw)

    def _store_decoded(self, fd, value):
        if fd.is_repeated:
            self._repeated(fd).append(value)
            self._present.add(fd.name)
        else:
            self._values[fd.name] = value
            self._present.add(fd.name)
            self._clear_oneof_siblings(fd)
        self._mark_modified()

    def ByteSize(self):  # noqa: N802
        return len(self.SerializeToString())

    def ListFields(self):  # noqa: N802
        out = []
        for fd in sorted(self.DESCRIPTOR.fields, key=lambda f: f.number):
            if fd.is_repeated:
                if self._values.get(fd.name):
                    out.append((fd, self._values[fd.name]))
            elif fd.name in self._present:
                out.append((fd, self._values[fd.name]))
        return out

    def __eq__(self, other):
        return (
            isinstance(other, MiniMessage)
            and type(self).DESCRIPTOR is type(other).DESCRIPTOR
            and self.SerializeToString() == other.SerializeToString()
        )

    def __repr__(self):
        parts = ", ".join(
            f"{fd.name}={value!r}" for fd, value in self.ListFields()
        )
        return f"{self.DESCRIPTOR.name}({parts})"


def make_message_class(descriptor: Descriptor) -> type:
    cls = type(descriptor.name, (MiniMessage,), {"DESCRIPTOR": descriptor,
                                                 "__slots__": ()})
    descriptor._concrete_class = cls
    # nested types hang off the class like protobuf's generated code
    for nested in descriptor.nested_types:
        setattr(cls, nested.name, make_message_class(nested))
    for enum in descriptor.enum_types:
        for v in enum.values:
            setattr(cls, v.name, v.number)
    return cls
