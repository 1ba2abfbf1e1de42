"""Protobuf descriptor → schema import (no protobuf wheel required).

Reference parity: ``ProtobufUtil.scala:14-74`` reads a compiled
``FileDescriptorSet`` (the ``protoc --descriptor_set_out`` ``.desc``
artifact) and returns ``Map[messageName, StructType]``, mapping each
field's JavaType to a Spark type (BOOLEAN→BooleanType, INT→IntegerType,
LONG→LongType, DOUBLE→DoubleType, FLOAT→FloatType, STRING/ENUM→
StringType, BYTE_STRING→BinaryType, MESSAGE→nested StructType).  This
module reproduces that surface — plus :func:`to_field_specs`, feeding
the same :class:`~.generator.FieldSpec` trees the Marquez/OpenMetadata
importers build (``operators/metadata.py``), so a generation plan can
start from a ``.desc`` file alone.

The sandbox ships no ``google.protobuf`` wheel, so the descriptor wire
format is decoded directly (public spec: https://protobuf.dev/
programming-guides/encoding/ — varints + tag/length-delimited records;
descriptor field numbers from ``google/protobuf/descriptor.proto``).
Only the handful of descriptor fields the import needs are read;
unknown fields are skipped by wire type, so any real ``protoc`` output
parses.

Reference quirks kept (flag-gated):

* ``repeated`` labels are IGNORED by the reference's proto-variant
  mapper (``getSchemaFromFieldsProto`` never reads the label) — a
  ``repeated int64`` imports as plain ``LongType``.  Default here
  matches; pass ``repeated_as_array=True`` for the faithful
  ``ArrayType`` (and ``MapType`` for map<k,v> synthetic entries).
* nullability: the proto-variant leaves every field nullable (Spark's
  ``StructField`` default), matching proto3 presence semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Iterator, Sequence

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from .generator import FieldSpec

# --------------------------------------------------------------------------
# descriptor.proto field numbers (public protobuf spec)
# --------------------------------------------------------------------------

# FieldDescriptorProto.Type values → JavaType buckets (descriptor.proto)
_T_DOUBLE, _T_FLOAT = 1, 2
_T_INT64, _T_UINT64, _T_INT32 = 3, 4, 5
_T_FIXED64, _T_FIXED32 = 6, 7
_T_BOOL, _T_STRING, _T_GROUP, _T_MESSAGE, _T_BYTES = 8, 9, 10, 11, 12
_T_UINT32, _T_ENUM = 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_LABEL_REPEATED = 3

#: proto type number → Spark type, following the reference's JavaType
#: switch exactly (ProtobufUtil.scala:41-57): INT-kind → IntegerType,
#: LONG-kind → LongType, ENUM → StringType, BYTES → BinaryType
_SPARK_TYPES: dict[int, DataType] = {
    _T_DOUBLE: DoubleType(),
    _T_FLOAT: FloatType(),
    _T_INT64: LongType(),
    _T_UINT64: LongType(),
    _T_INT32: IntegerType(),
    _T_FIXED64: LongType(),
    _T_FIXED32: IntegerType(),
    _T_BOOL: BooleanType(),
    _T_STRING: StringType(),
    _T_BYTES: BinaryType(),
    _T_UINT32: IntegerType(),
    _T_ENUM: StringType(),
    _T_SFIXED32: IntegerType(),
    _T_SFIXED64: LongType(),
    _T_SINT32: IntegerType(),
    _T_SINT64: LongType(),
}

#: proto type number → FieldSpec.type (generation surface)
_SPEC_TYPES: dict[int, str] = {
    _T_DOUBLE: "double",
    _T_FLOAT: "double",
    _T_INT64: "long",
    _T_UINT64: "long",
    _T_INT32: "int",
    _T_FIXED64: "long",
    _T_FIXED32: "int",
    _T_BOOL: "boolean",
    _T_STRING: "string",
    _T_BYTES: "binary",
    _T_UINT32: "int",
    _T_ENUM: "string",
    _T_SFIXED32: "int",
    _T_SFIXED64: "long",
    _T_SINT32: "int",
    _T_SINT64: "long",
}


# --------------------------------------------------------------------------
# wire-level decode (varint + tag dispatch; unknown fields skipped)
# --------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> "tuple[int, int]":
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint in descriptor")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long in descriptor")


def _fields(buf: bytes) -> "Iterator[tuple[int, int, Any]]":
    """Yield (field_number, wire_type, value) for one message's bytes.
    LEN fields yield raw bytes; varints yield ints; fixed widths yield
    raw bytes (none of the descriptor fields we read use them)."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated LEN field in descriptor")
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            val = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:  # fixed64
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt} in descriptor")
        yield num, wt, val


@dataclass
class ProtoField:
    name: str
    number: int
    type: int
    type_name: str = ""  # fully qualified ".pkg.Message" for MESSAGE/ENUM
    repeated: bool = False


@dataclass
class ProtoMessage:
    name: str
    fields: "list[ProtoField]" = dc_field(default_factory=list)
    nested: "list[ProtoMessage]" = dc_field(default_factory=list)
    map_entry: bool = False


@dataclass
class ProtoEnum:
    name: str
    values: "list[str]" = dc_field(default_factory=list)


@dataclass
class ProtoFile:
    name: str
    package: str = ""
    messages: "list[ProtoMessage]" = dc_field(default_factory=list)
    enums: "list[ProtoEnum]" = dc_field(default_factory=list)


def _parse_field(buf: bytes) -> ProtoField:
    f = ProtoField(name="", number=0, type=0)
    for num, _, val in _fields(buf):
        if num == 1:
            f.name = val.decode("utf-8")
        elif num == 3:
            f.number = val
        elif num == 4:
            f.repeated = val == _LABEL_REPEATED
        elif num == 5:
            f.type = val
        elif num == 6:
            f.type_name = val.decode("utf-8")
    return f


def _parse_enum(buf: bytes) -> ProtoEnum:
    e = ProtoEnum(name="")
    for num, _, val in _fields(buf):
        if num == 1:
            e.name = val.decode("utf-8")
        elif num == 2:  # EnumValueDescriptorProto
            for n2, _, v2 in _fields(val):
                if n2 == 1:
                    e.values.append(v2.decode("utf-8"))
    return e


def _parse_message(
    buf: bytes, enums_out: "list[tuple[str, ProtoEnum]]", scope: str
) -> ProtoMessage:
    m = ProtoMessage(name="")
    raw_nested: "list[bytes]" = []
    raw_enums: "list[bytes]" = []
    for num, _, val in _fields(buf):
        if num == 1:
            m.name = val.decode("utf-8")
        elif num == 2:
            m.fields.append(_parse_field(val))
        elif num == 3:
            raw_nested.append(val)
        elif num == 4:
            raw_enums.append(val)
        elif num == 7:  # MessageOptions
            for n2, _, v2 in _fields(val):
                if n2 == 7:  # map_entry
                    m.map_entry = bool(v2)
    inner_scope = f"{scope}.{m.name}"
    for raw in raw_nested:
        m.nested.append(_parse_message(raw, enums_out, inner_scope))
    for raw in raw_enums:
        e = _parse_enum(raw)
        enums_out.append((f"{inner_scope}.{e.name}", e))
    return m


def parse_file_descriptor_set(data: bytes) -> "list[ProtoFile]":
    """Decode a serialized ``FileDescriptorSet`` (``protoc
    --descriptor_set_out``) into plain Python descriptor objects."""
    files: "list[ProtoFile]" = []
    for num, _, val in _fields(data):
        if num != 1:  # FileDescriptorSet.file
            continue
        f = ProtoFile(name="")
        raw_msgs: "list[bytes]" = []
        raw_enums: "list[bytes]" = []
        for n2, _, v2 in _fields(val):
            if n2 == 1:
                f.name = v2.decode("utf-8")
            elif n2 == 2:
                f.package = v2.decode("utf-8")
            elif n2 == 4:
                raw_msgs.append(v2)
            elif n2 == 5:
                raw_enums.append(v2)
        f._enum_registry = []  # type: ignore[attr-defined]
        scope = f".{f.package}" if f.package else ""
        for raw in raw_msgs:
            f.messages.append(
                _parse_message(raw, f._enum_registry, scope)  # type: ignore[attr-defined]
            )
        for raw in raw_enums:
            e = _parse_enum(raw)
            f.enums.append(e)
            f._enum_registry.append((f"{scope}.{e.name}", e))  # type: ignore[attr-defined]
        files.append(f)
    return files


# --------------------------------------------------------------------------
# registry + schema mapping
# --------------------------------------------------------------------------


def _registries(
    files: "Sequence[ProtoFile]",
) -> "tuple[dict[str, ProtoMessage], dict[str, ProtoEnum]]":
    msgs: "dict[str, ProtoMessage]" = {}
    enums: "dict[str, ProtoEnum]" = {}

    def walk(m: ProtoMessage, scope: str) -> None:
        fq = f"{scope}.{m.name}"
        msgs[fq] = m
        for n in m.nested:
            walk(n, fq)

    for f in files:
        scope = f".{f.package}" if f.package else ""
        for m in f.messages:
            walk(m, scope)
        for fq, e in getattr(f, "_enum_registry", []):
            enums[fq] = e
    return msgs, enums


def _struct_of(
    m: ProtoMessage,
    msgs: "dict[str, ProtoMessage]",
    repeated_as_array: bool,
    visiting: "frozenset[str]",
    fq: str,
) -> StructType:
    if fq in visiting:
        raise ValueError(
            f"recursive message type {fq} cannot map to a Spark schema"
        )
    visiting = visiting | {fq}
    out: "list[StructField]" = []
    for fld in m.fields:
        if fld.type in (_T_MESSAGE, _T_GROUP):
            sub = msgs.get(fld.type_name)
            if sub is None:
                raise ValueError(
                    f"unresolved message type {fld.type_name!r} for field "
                    f"{fld.name!r} — is the .desc missing an import?"
                )
            if sub.map_entry and repeated_as_array:
                kt = _element_type(sub.fields[0], msgs, repeated_as_array, visiting)
                vt = _element_type(sub.fields[1], msgs, repeated_as_array, visiting)
                out.append(StructField(fld.name, MapType(kt, vt)))
                continue
            dt: DataType = _struct_of(
                sub, msgs, repeated_as_array, visiting, fld.type_name
            )
        else:
            try:
                dt = _SPARK_TYPES[fld.type]
            except KeyError:
                raise ValueError(
                    f"unable to parse proto type, type={fld.type} "
                    f"(field {fld.name!r})"
                ) from None
        if fld.repeated and repeated_as_array:
            dt = ArrayType(dt)
        out.append(StructField(fld.name, dt))
    return StructType(out)


def _element_type(
    fld: ProtoField,
    msgs: "dict[str, ProtoMessage]",
    repeated_as_array: bool,
    visiting: "frozenset[str]",
) -> DataType:
    if fld.type in (_T_MESSAGE, _T_GROUP):
        sub = msgs[fld.type_name]
        return _struct_of(sub, msgs, repeated_as_array, visiting, fld.type_name)
    return _SPARK_TYPES[fld.type]


def to_struct_types(
    data: "bytes | str", repeated_as_array: bool = False
) -> "dict[str, StructType]":
    """``{message simple name: StructType}`` for every TOP-LEVEL message
    in the descriptor set — the reference's ``toStructType`` map shape
    (``ProtobufUtil.scala:15-25``; nested messages appear only as struct
    fields of their containers).  ``data`` is the ``.desc`` bytes or a
    path to the file."""
    if isinstance(data, str):
        with open(data, "rb") as fh:
            data = fh.read()
    files = parse_file_descriptor_set(data)
    msgs, _ = _registries(files)
    out: "dict[str, StructType]" = {}
    for f in files:
        scope = f".{f.package}" if f.package else ""
        for m in f.messages:
            out[m.name] = _struct_of(
                m, msgs, repeated_as_array, frozenset(), f"{scope}.{m.name}"
            )
    return out


# --------------------------------------------------------------------------
# FieldSpec trees (generation surface, mirrors operators/metadata.py)
# --------------------------------------------------------------------------


def _spec_of(
    fld: ProtoField,
    msgs: "dict[str, ProtoMessage]",
    enums: "dict[str, ProtoEnum]",
    repeated_as_array: bool,
    visiting: "frozenset[str]",
) -> FieldSpec:
    if fld.type in (_T_MESSAGE, _T_GROUP):
        fq = fld.type_name
        if fq in visiting:
            raise ValueError(f"recursive message type {fq} in descriptor")
        sub = msgs.get(fq)
        if sub is None:
            raise ValueError(f"unresolved message type {fq!r}")
        spec = FieldSpec(
            name=fld.name,
            type="struct",
            fields=[
                _spec_of(sf, msgs, enums, repeated_as_array, visiting | {fq})
                for sf in sub.fields
            ],
        )
    elif fld.type == _T_ENUM and fld.type_name in enums:
        # richer than the reference's ENUM→string: the declared enum
        # VALUES become a oneOf pick so generated data is valid
        spec = FieldSpec(
            name=fld.name, type="oneOf", one_of=list(enums[fld.type_name].values)
        )
    else:
        try:
            spec = FieldSpec(name=fld.name, type=_SPEC_TYPES[fld.type])
        except KeyError:
            raise ValueError(
                f"unable to parse proto type, type={fld.type} "
                f"(field {fld.name!r})"
            ) from None
    if fld.repeated and repeated_as_array:
        spec = FieldSpec(name=fld.name, type="array", element=spec)
    return spec


def to_field_specs(
    data: "bytes | str", repeated_as_array: bool = False
) -> "dict[str, list[FieldSpec]]":
    """``{message simple name: [FieldSpec, ...]}`` — the generation-plan
    import, same consumer surface as ``metadata.from_marquez`` /
    ``from_openmetadata``.  Enum fields carry their declared values as a
    ``oneOf``."""
    if isinstance(data, str):
        with open(data, "rb") as fh:
            data = fh.read()
    files = parse_file_descriptor_set(data)
    msgs, enums = _registries(files)
    out: "dict[str, list[FieldSpec]]" = {}
    for f in files:
        for m in f.messages:
            out[m.name] = [
                _spec_of(fld, msgs, enums, repeated_as_array, frozenset())
                for fld in m.fields
            ]
    return out


# --------------------------------------------------------------------------
# encoder — deterministic .desc synthesis for tests/fixtures (the sandbox
# has no protoc; the wire format is symmetric, so the same field tables
# drive both directions)
# --------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _len_field(num: int, payload: bytes) -> bytes:
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _varint_field(num: int, v: int) -> bytes:
    return _varint(num << 3) + _varint(v)


def _encode_field(f: dict) -> bytes:
    out = _len_field(1, f["name"].encode())
    out += _varint_field(3, f["number"])
    out += _varint_field(4, 3 if f.get("repeated") else 1)
    out += _varint_field(5, f["type"])
    if f.get("type_name"):
        out += _len_field(6, f["type_name"].encode())
    return out


def _encode_enum(e: dict) -> bytes:
    out = _len_field(1, e["name"].encode())
    for i, v in enumerate(e["values"]):
        out += _len_field(2, _len_field(1, v.encode()) + _varint_field(2, i))
    return out


def _encode_message(m: dict) -> bytes:
    out = _len_field(1, m["name"].encode())
    for f in m.get("fields", []):
        out += _len_field(2, _encode_field(f))
    for n in m.get("nested", []):
        out += _len_field(3, _encode_message(n))
    for e in m.get("enums", []):
        out += _len_field(4, _encode_enum(e))
    if m.get("map_entry"):
        out += _len_field(7, _varint_field(7, 1))
    return out


def encode_file_descriptor_set(files: "Sequence[dict]") -> bytes:
    """Serialize ``[{name, package, messages:[...], enums:[...]}]`` into
    ``FileDescriptorSet`` bytes (what ``protoc --descriptor_set_out``
    emits).  Field dicts: ``{name, number, type, type_name?, repeated?}``
    with proto type numbers; enum dicts: ``{name, values: [str, ...]}``."""
    out = b""
    for f in files:
        body = _len_field(1, f["name"].encode())
        if f.get("package"):
            body += _len_field(2, f["package"].encode())
        for m in f.get("messages", []):
            body += _len_field(4, _encode_message(m))
        for e in f.get("enums", []):
            body += _len_field(5, _encode_enum(e))
        out += _len_field(1, body)
    return out
