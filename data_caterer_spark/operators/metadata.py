"""Metadata-source schema import — build generation specs from an external
schema/metadata service document instead of from data.

Reference parity: ``MetadataSourceBuilder.scala`` / ``MetadataSourceModels
.scala`` declare openmetadata/marquez/http metadata sources whose schema
documents seed generation plans; the shipped test fixtures
(``app/src/test/resources/sample/metadata/marquez/
get_dataset_api_response.json``, ``openmetadata/get_table_response.json``)
define the two document shapes parsed here:

* **Marquez** (OpenLineage dataset API): top-level ``fields`` list of
  ``{name, type, description}`` with SQL-ish type names;
* **OpenMetadata** (table API): ``data[]`` tables, each with ``columns``
  of ``{name, dataType, dataLength, children, constraint, description}``
  — nested STRUCT/ARRAY via ``children``.

Both parse into :class:`~.generator.FieldSpec` trees (the same objects
the YAML/Python front doors build), so a generation plan can start from
a metadata service document alone, then optionally overlay *observed*
bounds/categories from data profiling (:func:`merge_with_profiles` —
``operators/inference.py``), which mirrors how the reference combines
metadata-source schemas with calculated generation metadata
(``MetadataUtil``-style enrichment).
"""

from __future__ import annotations

import json
from typing import Any, Sequence

from .generator import FieldSpec
from .inference import infer_field_specs

#: SQL / metadata-service type name -> FieldSpec type
_TYPE_MAP: dict[str, str] = {
    "tinyint": "short",
    "smallint": "short",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "numeric": "double",
    "number": "double",
    "decimal": "decimal",
    "float": "double",
    "double": "double",
    "real": "double",
    "varchar": "string",
    "char": "string",
    "text": "string",
    "string": "string",
    "json": "string",
    "uuid": "string",
    "date": "date",
    "timestamp": "timestamp",
    "timestamptz": "timestamp",
    "datetime": "timestamp",
    "boolean": "boolean",
    "bool": "boolean",
}


class MetadataParseError(ValueError):
    pass


#: metadata documents carry no value ranges, so temporal types need
#: usable defaults (FieldSpec's generic 0/100 is not a valid literal)
_DEFAULT_BOUNDS: dict[str, tuple[str, str]] = {
    "date": ("2020-01-01", "2022-12-31"),
    "timestamp": ("2020-01-01 00:00:00", "2022-12-31 23:59:59"),
}


def _map_type(raw: str, field: str) -> str:
    t = _TYPE_MAP.get(str(raw).strip().lower())
    if t is None:
        raise MetadataParseError(
            f"field {field!r}: unmapped metadata type {raw!r}"
        )
    return t


def _typed_spec(name: str, mapped: str) -> FieldSpec:
    spec = FieldSpec(name, type=mapped)
    if mapped in _DEFAULT_BOUNDS:
        spec.min, spec.max = _DEFAULT_BOUNDS[mapped]
    return spec


def _load(doc: "str | dict") -> dict:
    if isinstance(doc, dict):
        return doc
    if "\n" not in doc and doc.endswith(".json"):
        with open(doc) as f:
            return json.load(f)
    return json.loads(doc)


# ---------------------------------------------------------------------------
# Marquez (OpenLineage)
# ---------------------------------------------------------------------------


def from_marquez(doc: "str | dict") -> list[FieldSpec]:
    """One Marquez dataset document -> FieldSpec list."""
    d = _load(doc)
    fields = d.get("fields")
    if not fields:
        raise MetadataParseError(
            f"marquez dataset {d.get('name')!r} has no fields"
        )
    return [
        _typed_spec(f["name"], _map_type(f.get("type", "string"), f["name"]))
        for f in fields
    ]


def marquez_dataset_name(doc: "str | dict") -> str:
    return _load(doc).get("name", "dataset")


# ---------------------------------------------------------------------------
# OpenMetadata
# ---------------------------------------------------------------------------


def _om_column(col: dict[str, Any]) -> FieldSpec:
    name = col["name"]
    dtype = str(col.get("dataType", "STRING")).lower()
    children = col.get("children") or []
    if dtype == "struct" or (children and dtype not in ("array",)):
        return FieldSpec(
            name, type="struct", fields=[_om_column(c) for c in children]
        )
    if dtype == "array":
        elem_type = str(col.get("arrayDataType", "STRING")).lower()
        if children:
            elem = FieldSpec(
                f"{name}_elem",
                type="struct",
                fields=[_om_column(c) for c in children],
            )
        else:
            elem = _typed_spec(f"{name}_elem", _map_type(elem_type, name))
        return FieldSpec(name, type="array", element=elem)
    spec = _typed_spec(name, _map_type(dtype, name))
    if spec.type == "string" and col.get("dataLength"):
        spec.max_len = int(col["dataLength"])
        spec.min_len = min(spec.min_len, spec.max_len)
    if spec.type == "decimal":
        if col.get("precision"):
            spec.precision = int(col["precision"])
        if col.get("scale") is not None:
            spec.scale = int(col["scale"])
    return spec


def from_openmetadata(doc: "str | dict") -> dict[str, list[FieldSpec]]:
    """An OpenMetadata table-list document -> {table name: FieldSpec list}.
    Also accepts a single-table document (no ``data`` wrapper)."""
    d = _load(doc)
    tables = d.get("data", [d] if "columns" in d else None)
    if not tables:
        raise MetadataParseError("openmetadata document has no tables")
    out: dict[str, list[FieldSpec]] = {}
    for t in tables:
        cols = t.get("columns")
        if not cols:
            raise MetadataParseError(
                f"openmetadata table {t.get('name')!r} has no columns"
            )
        out[t.get("name", "table")] = [_om_column(c) for c in cols]
    return out


# ---------------------------------------------------------------------------
# enrichment: overlay observed data profiles onto metadata-typed specs
# ---------------------------------------------------------------------------


def merge_with_profiles(
    specs: Sequence[FieldSpec], df
) -> list[FieldSpec]:
    """Enrich metadata-derived specs with OBSERVED generation metadata
    from real data (bounds, lengths, oneOf categories) — the profiling
    side wins on value ranges, the metadata side wins on names/types.
    Nested/array specs pass through untouched (profiles are scalar)."""
    inferred = {
        s.name: s
        for s in infer_field_specs(
            df.select(
                *[
                    s.name
                    for s in specs
                    if s.type not in ("struct", "array") and s.name in df.columns
                ]
            )
        )
    }
    from dataclasses import replace

    out = []
    for s in specs:
        obs = inferred.get(s.name)
        if obs is None or s.type in ("struct", "array"):
            out.append(s)
            continue
        if obs.one_of:
            # low-cardinality column: regenerate from its observed
            # categorical values (the oneOf-detection surface)
            out.append(
                replace(s, type="oneOf", one_of=obs.one_of,
                        null_prob=obs.null_prob)
            )
        elif s.type == "string":
            out.append(
                replace(s, min_len=obs.min_len, max_len=obs.max_len,
                        null_prob=obs.null_prob)
            )
        else:
            out.append(
                replace(s, min=obs.min, max=obs.max,
                        null_prob=obs.null_prob)
            )
    return out
