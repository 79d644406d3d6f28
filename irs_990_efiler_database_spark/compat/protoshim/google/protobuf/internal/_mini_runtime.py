"""Minimal pure-Python protobuf runtime — just enough of the public
``google.protobuf`` surface to execute pyspark's generated
``StateMessage_pb2.py`` and speak the transformWithStateInPandas state
protocol with the JVM, in sandboxes where the real protobuf wheel
cannot be installed (no network, no pip).

Scope (deliberately narrow, validated against the proto3 wire spec
https://protobuf.dev/programming-guides/encoding/):
- wire types 0 (varint) and 2 (length-delimited); types 1/5 are
  skipped when unknown and rejected for known fields (StateMessage
  uses none)
- field types: int32, int64, bool, enum, string, bytes, message;
  singular and repeated; oneofs need no special handling for
  serialization (presence == the message field was set)
- presence: proto3 semantics — scalars serialize only when != default,
  message fields serialize when explicitly set (including empty
  messages, which is how oneof arms like ``Get()`` travel)

The JVM side parses everything this runtime emits with real protobuf
and vice versa, so any wire-format bug fails loudly as a protocol
error, never as silent corruption. NOT a general protobuf: no maps,
groups, packed repeated scalars (parse-side packed varints ARE
handled), extensions, unknown-field retention, or reflection beyond
what the generated module touches.
"""

from __future__ import annotations

# ---------------------------------------------------------------- wire

_MASK64 = (1 << 64) - 1


def encode_varint(value: int) -> bytes:
    value &= _MASK64
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result & _MASK64, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _to_signed64(value: int) -> int:
    return value - (1 << 64) if value >= (1 << 63) else value


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire_type == 1:
        return pos + 8
    if wire_type == 2:
        n, pos = decode_varint(buf, pos)
        return pos + n
    if wire_type == 5:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire_type}")


# ------------------------------------------------------- field model

# FieldDescriptorProto.Type values (descriptor.proto)
TYPE_INT64 = 3
TYPE_INT32 = 5
TYPE_BOOL = 8
TYPE_STRING = 9
TYPE_MESSAGE = 11
TYPE_BYTES = 12
TYPE_ENUM = 14

_VARINT_TYPES = {TYPE_INT64, TYPE_INT32, TYPE_BOOL, TYPE_ENUM}
_LEN_TYPES = {TYPE_STRING, TYPE_BYTES, TYPE_MESSAGE}

LABEL_REPEATED = 3


class FieldSpec:
    __slots__ = ("name", "number", "type", "repeated", "message_cls")

    def __init__(self, name, number, ftype, repeated, message_cls=None):
        self.name = name
        self.number = number
        self.type = ftype
        self.repeated = repeated
        self.message_cls = message_cls  # resolved in a second pass

    def default(self):
        if self.repeated:
            return []
        if self.type in (TYPE_INT64, TYPE_INT32, TYPE_ENUM):
            return 0
        if self.type == TYPE_BOOL:
            return False
        if self.type == TYPE_STRING:
            return ""
        if self.type == TYPE_BYTES:
            return b""
        return None  # message: handled by auto-vivification


# ---------------------------------------------------------- messages


class _AttachList(list):
    """Repeated-field view that registers its owning message in ITS
    parent on first mutation — reading ``a.b.items`` must not mark
    ``b`` present, but ``a.b.items.append(x)`` must."""

    __slots__ = ("_owner",)

    def __init__(self, owner):
        super().__init__()
        self._owner = owner

    def append(self, item):
        super().append(item)
        self._owner._attach()

    def extend(self, items):
        super().extend(items)
        self._owner._attach()

    def insert(self, index, item):
        super().insert(index, item)
        self._owner._attach()

    def __iadd__(self, items):
        self.extend(items)
        return self

    # item/slice writes must also attach (ADVICE r9): a client doing
    # ``msg.sub.items[0:0] = [...]`` mutates presence exactly like
    # append/extend. Deletions/removals attach too — an explicit "set
    # to empty" on a previously-read detached view is a write, and
    # attaching an empty list is harmless (empty repeated = absent on
    # the wire either way).
    def __setitem__(self, index, item):
        super().__setitem__(index, item)
        self._owner._attach()

    def __delitem__(self, index):
        super().__delitem__(index)
        self._owner._attach()

    def remove(self, item):
        super().remove(item)
        self._owner._attach()

    def pop(self, index=-1):
        out = super().pop(index)
        self._owner._attach()
        return out

    def clear(self):
        super().clear()
        self._owner._attach()


class MiniMessage:
    """Base for generated-equivalent message classes. Subclasses carry
    ``_FIELDS`` (name -> FieldSpec) and ``_BY_NUMBER``.

    Presence semantics (ADVICE r7 / VERDICT r8 #7): reading an UNSET
    singular message field returns a cached *detached* default — it is
    persisted into ``_values`` (and so onto the wire / into ``__eq__``)
    only when first written through (``msg.ttl.durationMs = 5``), never
    by the read itself. Merely inspecting an unset oneof arm before
    ``SerializeToString`` therefore cannot emit a wrong/extra arm."""

    _FIELDS: dict[str, FieldSpec] = {}
    _BY_NUMBER: dict[int, FieldSpec] = {}

    def __init__(self, **kwargs):
        object.__setattr__(self, "_values", {})
        for k, v in kwargs.items():
            if k not in self._FIELDS:
                raise ValueError(
                    f"{type(self).__name__} has no field {k!r}"
                )
            if v is None:
                continue  # proto kwargs treat None as "leave unset"
            setattr(self, k, v)

    # -- attribute protocol ------------------------------------------
    def __getattr__(self, name):
        spec = self._FIELDS.get(name)
        if spec is None:
            raise AttributeError(name)
        values = self.__dict__["_values"]
        if name in values:
            return values[name]
        if spec.repeated:
            lst = _AttachList(self)
            values[name] = lst  # empty list = absent on wire / in __eq__
            return lst
        if spec.type == TYPE_MESSAGE:
            # detached default, cached so repeated reads return the SAME
            # view (write-through from either read must not race)
            lazy = self.__dict__.setdefault("_lazy", {})
            sub = lazy.get(name)
            if sub is None:
                sub = spec.message_cls()
                sub.__dict__["_parent_hook"] = (self, name)
                lazy[name] = sub
            return sub
        return spec.default()

    def _attach(self) -> None:
        """First write-through: persist this (previously detached)
        submessage into its parent's ``_values`` and cascade upward so
        ``a.b.c.x = 1`` marks the whole chain present."""
        hook = self.__dict__.pop("_parent_hook", None)
        if hook is None:
            return
        parent, name = hook
        pvals = parent.__dict__["_values"]
        # an explicit ``parent.name = other`` after our read wins; do
        # not clobber it from a stale detached view
        if name not in pvals:
            pvals[name] = self
            parent.__dict__.get("_lazy", {}).pop(name, None)
            parent._attach()

    def __setattr__(self, name, value):
        spec = self._FIELDS.get(name)
        if spec is None:
            raise AttributeError(
                f"{type(self).__name__} has no field {name!r}"
            )
        if spec.repeated:
            value = list(value)
        elif spec.type == TYPE_MESSAGE:
            if not isinstance(value, spec.message_cls):
                raise TypeError(
                    f"{name} expects {spec.message_cls.__name__}"
                )
        elif spec.type == TYPE_BOOL:
            value = bool(value)
        elif spec.type in (TYPE_INT32, TYPE_INT64, TYPE_ENUM):
            value = int(value)
        elif spec.type == TYPE_STRING:
            if not isinstance(value, str):
                raise TypeError(f"{name} expects str")
        elif spec.type == TYPE_BYTES:
            value = bytes(value)
        self.__dict__["_values"][name] = value
        # an explicit set supersedes any cached detached view and marks
        # this message present in ITS parent (write-through presence)
        self.__dict__.get("_lazy", {}).pop(name, None)
        self._attach()

    # -- serialization -----------------------------------------------
    def SerializeToString(self) -> bytes:  # noqa: N802 — protobuf API
        out = bytearray()
        values = self.__dict__["_values"]
        for number in sorted(self._BY_NUMBER):
            spec = self._BY_NUMBER[number]
            if spec.name not in values:
                continue
            value = values[spec.name]
            items = value if spec.repeated else [value]
            for item in items:
                out += self._encode_field(spec, item)
        return bytes(out)

    @staticmethod
    def _encode_field(spec: FieldSpec, value) -> bytes:
        if spec.type in _VARINT_TYPES:
            if not spec.repeated and not value:
                return b""  # proto3: defaults are absent on the wire
            tag = encode_varint((spec.number << 3) | 0)
            return tag + encode_varint(int(value))
        tag = encode_varint((spec.number << 3) | 2)
        if spec.type == TYPE_MESSAGE:
            body = value.SerializeToString()
            # presence: an explicitly-set message always serializes,
            # even empty — oneof arms like Get() are exactly this
            return tag + encode_varint(len(body)) + body
        if spec.type == TYPE_STRING:
            body = value.encode("utf-8")
        else:  # bytes
            body = value
        if not spec.repeated and not body:
            return b""
        return tag + encode_varint(len(body)) + body

    # -- parsing -------------------------------------------------------
    def ParseFromString(self, data: bytes) -> int:  # noqa: N802
        self.__dict__["_values"].clear()
        self.__dict__.get("_lazy", {}).clear()
        self._merge(data)
        return len(data)

    def _merge(self, buf: bytes) -> None:
        values = self.__dict__["_values"]
        if buf:
            # parsing content into a detached view is a write-through
            self._attach()
        pos = 0
        while pos < len(buf):
            key, pos = decode_varint(buf, pos)
            number, wire_type = key >> 3, key & 7
            spec = self._BY_NUMBER.get(number)
            if spec is None:
                pos = _skip_field(buf, pos, wire_type)
                continue
            if spec.type in _VARINT_TYPES:
                if wire_type == 2 and spec.repeated:
                    # packed repeated varints
                    n, pos = decode_varint(buf, pos)
                    end = pos + n
                    lst = values.setdefault(spec.name, [])
                    while pos < end:
                        raw, pos = decode_varint(buf, pos)
                        lst.append(self._coerce_varint(spec, raw))
                    continue
                if wire_type != 0:
                    raise ValueError(
                        f"field {spec.name}: wire type {wire_type} "
                        "for varint field"
                    )
                raw, pos = decode_varint(buf, pos)
                item = self._coerce_varint(spec, raw)
            else:
                if wire_type != 2:
                    raise ValueError(
                        f"field {spec.name}: wire type {wire_type} "
                        "for length-delimited field"
                    )
                n, pos = decode_varint(buf, pos)
                chunk = buf[pos : pos + n]
                if len(chunk) != n:
                    raise ValueError("truncated length-delimited field")
                pos += n
                if spec.type == TYPE_MESSAGE:
                    item = spec.message_cls()
                    item._merge(chunk)
                elif spec.type == TYPE_STRING:
                    item = chunk.decode("utf-8")
                else:
                    item = bytes(chunk)
            if spec.repeated:
                values.setdefault(spec.name, []).append(item)
            else:
                values[spec.name] = item

    @staticmethod
    def _coerce_varint(spec: FieldSpec, raw: int):
        if spec.type == TYPE_BOOL:
            return raw != 0
        return _to_signed64(raw)

    # -- conveniences ----------------------------------------------------
    def HasField(self, name: str) -> bool:  # noqa: N802
        return name in self.__dict__["_values"]

    def __repr__(self):
        vals = ", ".join(
            f"{k}={v!r}" for k, v in self.__dict__["_values"].items()
        )
        return f"{type(self).__name__}({vals})"

    def _present(self) -> dict:
        """Fields that exist on the wire: empty repeated lists (left
        behind by a pure read) are absent, so ``__eq__`` is independent
        of attribute-access order."""
        return {
            k: v
            for k, v in self.__dict__["_values"].items()
            if not (isinstance(v, list) and not v)
        }

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self._present() == other._present()
        )


# ----------------------------------------- FileDescriptorProto parse
#
# The generated module hands us a serialized FileDescriptorProto; we
# parse just the fields needed to rebuild the message classes. Tag
# numbers from protobuf's own descriptor.proto (public, stable since
# proto2's release).


def _parse_fields(buf: bytes):
    """Generic walk: yields (number, wire_type, value) where value is
    the varint int or the length-delimited bytes."""
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        number, wire_type = key >> 3, key & 7
        if wire_type == 0:
            value, pos = decode_varint(buf, pos)
        elif wire_type == 2:
            n, pos = decode_varint(buf, pos)
            value = buf[pos : pos + n]
            pos += n
        else:
            pos = _skip_field(buf, pos, wire_type)
            continue
        yield number, wire_type, value


def parse_file_descriptor(data: bytes) -> dict:
    fd = {"name": "", "package": "", "messages": [], "enums": []}
    for num, _wt, val in _parse_fields(data):
        if num == 1:
            fd["name"] = val.decode()
        elif num == 2:
            fd["package"] = val.decode()
        elif num == 4:
            fd["messages"].append(_parse_descriptor(val))
        elif num == 5:
            fd["enums"].append(_parse_enum(val))
    return fd


def _parse_descriptor(data: bytes) -> dict:
    msg = {"name": "", "fields": [], "nested": [], "enums": []}
    for num, _wt, val in _parse_fields(data):
        if num == 1:
            msg["name"] = val.decode()
        elif num == 2:
            msg["fields"].append(_parse_field(val))
        elif num == 3:
            msg["nested"].append(_parse_descriptor(val))
        elif num == 4:
            msg["enums"].append(_parse_enum(val))
    return msg


def _parse_field(data: bytes) -> dict:
    f = {
        "name": "",
        "number": 0,
        "label": 1,
        "type": 0,
        "type_name": "",
    }
    for num, _wt, val in _parse_fields(data):
        if num == 1:
            f["name"] = val.decode()
        elif num == 3:
            f["number"] = val
        elif num == 4:
            f["label"] = val
        elif num == 5:
            f["type"] = val
        elif num == 6:
            f["type_name"] = val.decode()
    return f


def _parse_enum(data: bytes) -> dict:
    enum = {"name": "", "values": []}
    for num, _wt, val in _parse_fields(data):
        if num == 1:
            enum["name"] = val.decode()
        elif num == 2:
            name, number = "", 0
            for n2, _w2, v2 in _parse_fields(val):
                if n2 == 1:
                    name = v2.decode()
                elif n2 == 2:
                    number = v2
            enum["values"].append((name, number))
    return enum


# -------------------------------------------------------- class build


class MiniFileDescriptor:
    """What AddSerializedFile returns: holds the built classes so the
    builder module can inject them into the generated module's
    globals. Arbitrary attribute assignment allowed (the generated
    code sets ``_loaded_options`` etc.)."""

    def __init__(self, fd: dict):
        self.name = fd["name"]
        self.package = fd["package"]
        self.message_classes: dict[str, type] = {}
        self.enum_types: dict[str, dict[str, int]] = {}
        self._build(fd)

    def _build(self, fd: dict) -> None:
        # pass 1: classes with unresolved message-field references
        pending: list[tuple[FieldSpec, str]] = []
        for m in fd["messages"]:
            self._build_message(m, pending)
        for e in fd["enums"]:
            self.enum_types[e["name"]] = dict(e["values"])
        # pass 2: resolve .package.TypeName references
        for spec, type_name in pending:
            simple = type_name.rsplit(".", 1)[-1]
            if spec.type == TYPE_MESSAGE:
                cls = self.message_classes.get(simple)
                if cls is None:
                    raise ValueError(f"unresolved message type {type_name}")
                spec.message_cls = cls
            # enums need no resolution: values travel as ints

    def _build_message(self, m: dict, pending) -> None:
        for nested in m["nested"]:
            self._build_message(nested, pending)
        for e in m["enums"]:
            self.enum_types[e["name"]] = dict(e["values"])
        fields: dict[str, FieldSpec] = {}
        for f in m["fields"]:
            spec = FieldSpec(
                f["name"],
                f["number"],
                f["type"],
                f["label"] == LABEL_REPEATED,
            )
            if f["type"] in (TYPE_MESSAGE, TYPE_ENUM) and f["type_name"]:
                pending.append((spec, f["type_name"]))
            fields[spec.name] = spec
        cls = type(
            m["name"],
            (MiniMessage,),
            {
                "_FIELDS": fields,
                "_BY_NUMBER": {s.number: s for s in fields.values()},
            },
        )
        self.message_classes[m["name"]] = cls


class _DescriptorPlaceholder:
    """Stands in for the per-message descriptor objects the generated
    module assigns ``_serialized_start``/``_serialized_end`` onto."""

    def __init__(self, name: str):
        self.name = name
