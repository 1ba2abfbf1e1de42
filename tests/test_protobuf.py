"""Protobuf descriptor import (ProtobufUtil.scala parity): wire-level
FileDescriptorSet decode, Spark-type mapping, FieldSpec generation
surface, and round-trip with the deterministic encoder."""

from __future__ import annotations

import os

import pytest

from data_caterer_spark.operators import protobuf as PB
from data_caterer_spark.operators.generator import generate

REF_DESC = (
    "/root/reference/app/src/test/resources/sample/files/protobuf"
)

TURN_DESC = [
    {
        "name": "turn.proto",
        "package": "dcs.demo",
        "messages": [
            {
                "name": "Turn",
                "fields": [
                    {"name": "conv_id", "number": 1, "type": 9},
                    {"name": "turn_idx", "number": 2, "type": 5},
                    {"name": "score", "number": 3, "type": 1},
                    {"name": "keep", "number": 4, "type": 8},
                    {"name": "payload", "number": 5, "type": 12},
                    {
                        "name": "role",
                        "number": 6,
                        "type": 14,
                        "type_name": ".dcs.demo.Role",
                    },
                    {
                        "name": "meta",
                        "number": 7,
                        "type": 11,
                        "type_name": ".dcs.demo.Meta",
                    },
                    {
                        "name": "tags",
                        "number": 8,
                        "type": 9,
                        "repeated": True,
                    },
                ],
            },
            {
                "name": "Meta",
                "fields": [
                    {"name": "lang", "number": 1, "type": 9},
                    {"name": "tokens", "number": 2, "type": 3},
                ],
            },
        ],
        "enums": [
            {"name": "Role", "values": ["USER", "ASSISTANT", "TOOL"]}
        ],
    }
]


def test_roundtrip_encoder_parser():
    data = PB.encode_file_descriptor_set(TURN_DESC)
    files = PB.parse_file_descriptor_set(data)
    assert len(files) == 1
    f = files[0]
    assert f.name == "turn.proto" and f.package == "dcs.demo"
    assert [m.name for m in f.messages] == ["Turn", "Meta"]
    turn = f.messages[0]
    assert [fl.name for fl in turn.fields] == [
        "conv_id", "turn_idx", "score", "keep", "payload", "role",
        "meta", "tags",
    ]
    assert turn.fields[7].repeated
    assert f.enums[0].values == ["USER", "ASSISTANT", "TOOL"]


def test_struct_types_reference_mapping():
    data = PB.encode_file_descriptor_set(TURN_DESC)
    structs = PB.to_struct_types(data)
    assert set(structs) == {"Turn", "Meta"}
    # the reference's JavaType switch: INT32->int, INT64->bigint,
    # DOUBLE->double, BOOL->boolean, BYTES->binary, ENUM->string,
    # MESSAGE->nested struct; repeated label IGNORED (plain string)
    assert structs["Turn"].simpleString() == (
        "struct<conv_id:string,turn_idx:int,score:double,keep:boolean,"
        "payload:binary,role:string,meta:struct<lang:string,tokens:bigint>,"
        "tags:string>"
    )
    arr = PB.to_struct_types(data, repeated_as_array=True)
    assert "tags:array<string>" in arr["Turn"].simpleString()


def test_field_specs_enum_becomes_oneof():
    data = PB.encode_file_descriptor_set(TURN_DESC)
    specs = PB.to_field_specs(data)
    by_name = {s.name: s for s in specs["Turn"]}
    assert by_name["role"].type == "oneOf"
    assert by_name["role"].one_of == ["USER", "ASSISTANT", "TOOL"]
    assert by_name["meta"].type == "struct"
    assert [c.name for c in by_name["meta"].fields] == ["lang", "tokens"]
    assert by_name["payload"].type == "binary"


def test_generate_from_descriptor_specs(spark):
    data = PB.encode_file_descriptor_set(TURN_DESC)
    specs = PB.to_field_specs(data)
    df = generate(spark, specs["Turn"], count=50)
    assert df.count() == 50
    declared = PB.to_struct_types(data)["Turn"]
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in declared.fields}
    assert got == want
    roles = {r.role for r in df.select("role").distinct().collect()}
    assert roles <= {"USER", "ASSISTANT", "TOOL"}


def test_recursive_message_raises():
    desc = [
        {
            "name": "rec.proto",
            "package": "p",
            "messages": [
                {
                    "name": "Node",
                    "fields": [
                        {"name": "v", "number": 1, "type": 5},
                        {
                            "name": "next",
                            "number": 2,
                            "type": 11,
                            "type_name": ".p.Node",
                        },
                    ],
                }
            ],
        }
    ]
    data = PB.encode_file_descriptor_set(desc)
    with pytest.raises(ValueError, match="recursive"):
        PB.to_struct_types(data)


def test_unresolved_message_raises():
    desc = [
        {
            "name": "bad.proto",
            "package": "p",
            "messages": [
                {
                    "name": "M",
                    "fields": [
                        {
                            "name": "x",
                            "number": 1,
                            "type": 11,
                            "type_name": ".elsewhere.Gone",
                        }
                    ],
                }
            ],
        }
    ]
    data = PB.encode_file_descriptor_set(desc)
    with pytest.raises(ValueError, match="unresolved"):
        PB.to_struct_types(data)


@pytest.mark.skipif(
    not os.path.exists(f"{REF_DESC}/simple.desc"),
    reason="reference descriptors not present",
)
def test_real_protoc_descriptors_parse():
    """The reference's own `protoc --descriptor_set_out` artifacts (the
    exact inputs ProtobufUtil.scala reads in its tests) must decode."""
    simple = PB.to_struct_types(f"{REF_DESC}/simple.desc")
    assert simple["Simple"].simpleString() == "struct<name:string,age:bigint>"

    ex = PB.to_struct_types(f"{REF_DESC}/example.desc")
    assert set(ex) == {"OtherExample", "Proto3AllTypes"}
    s = ex["Proto3AllTypes"].simpleString()
    assert "enum_val:string" in s  # ENUM -> StringType
    assert "message:struct<other:string>" in s  # MESSAGE -> nested
    assert "repeated_num:bigint" in s  # label ignored (reference parity)
    # corrected semantics under the flag
    s2 = PB.to_struct_types(
        f"{REF_DESC}/example.desc", repeated_as_array=True
    )["Proto3AllTypes"].simpleString()
    assert "repeated_num:array<bigint>" in s2
    assert "map:map<string,string>" in s2
    # enum values surface in the generation specs
    specs = PB.to_field_specs(f"{REF_DESC}/example.desc")
    by = {sp.name: sp for sp in specs["Proto3AllTypes"]}
    assert by["enum_val"].one_of == ["NOTHING", "FIRST", "SECOND"]
