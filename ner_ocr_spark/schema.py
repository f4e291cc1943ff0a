"""Dynamic entity schemas: YAML -> Spark StructType compiler.

Mirrors the reference's runtime Pydantic model builder
(/root/reference/src/entity_builder.py:27-171): the same YAML format, the
same 8-entry supported-type map (:12-21), the same required-field handling
(:116-127), the same list-wrapper naming quirks (:144-160 — the 'y' branch
wins over the 'Entity' branch because it is checked first), and the same
permissive fallbacks (unknown type string -> `str | None`). Built-in
AddressEntity/AddressEntityList (/root/reference/src/entities.py:9-38)
merge with YAML entities into ENTITY_REGISTRY (:46-49).

The compiled StructType is the schema argument of `from_json`
(`parse_entity_json`); malformed JSON yields an all-null struct coalesced to
an empty-model struct — the reference's parse-failure-to-empty-model
semantics (/root/reference/src/entity_extraction.py:93-97).
"""

from __future__ import annotations

from typing import Any

import yaml

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# /root/reference/src/entity_builder.py:12-21
SUPPORTED_TYPES: dict[str, tuple[T.DataType, bool]] = {
    "str": (T.StringType(), False),
    "int": (T.LongType(), False),
    "float": (T.DoubleType(), False),
    "bool": (T.BooleanType(), False),
    "str | None": (T.StringType(), True),
    "int | None": (T.LongType(), True),
    "float | None": (T.DoubleType(), True),
    "bool | None": (T.BooleanType(), True),
}

_DEFAULT_TYPE = ("str | None", (T.StringType(), True))


def list_wrapper_field(name: str) -> str:
    """Pluralised items-field name, reproducing the reference's branch order
    (/root/reference/src/entity_builder.py:146-153): lowercase first letter;
    then 'y' -> 'ies' BEFORE the 'Entity' -> 'Entities' check."""
    items_field = name[0].lower() + name[1:]
    if items_field.endswith("y"):
        return items_field[:-1] + "ies"
    if items_field.endswith("Entity"):
        return items_field[:-6] + "Entities"
    return items_field + "s"


def build_entity_struct(name: str, definition: dict[str, Any]) -> dict[str, T.StructType]:
    """One entity definition -> {name: StructType[, nameList: StructType]}."""
    if not definition:
        raise ValueError(f"Empty definition for entity '{name}'")
    fields_config = definition.get("fields", {})
    if not fields_config:
        raise ValueError(f"No fields defined for entity '{name}'")
    create_list = definition.get("create_list", False)

    fields: list[T.StructField] = []
    for field_name, field_def in fields_config.items():
        if isinstance(field_def, str):
            dtype, nullable = SUPPORTED_TYPES.get(field_def, _DEFAULT_TYPE[1])
            fields.append(T.StructField(field_name, dtype, True))
        elif isinstance(field_def, dict):
            type_str = field_def.get("type", "str | None")
            is_required = field_def.get("required", False)
            if is_required:
                base = type_str.replace(" | None", "")
                dtype, _ = SUPPORTED_TYPES.get(base, SUPPORTED_TYPES["str"])
                # required -> non-nullable in the declared schema; from_json
                # still yields null on absence, checked downstream
                fields.append(T.StructField(field_name, dtype, False))
            else:
                dtype, _ = SUPPORTED_TYPES.get(type_str, _DEFAULT_TYPE[1])
                fields.append(T.StructField(field_name, dtype, True))
        else:
            raise TypeError(
                f"Invalid field definition for '{field_name}' in entity '{name}'"
            )
    entity_struct = T.StructType(fields)
    result = {name: entity_struct}
    if create_list:
        result[f"{name}List"] = T.StructType(
            [T.StructField(list_wrapper_field(name), T.ArrayType(entity_struct), False)]
        )
    return result


def load_entities_from_yaml(yaml_text: str) -> dict[str, T.StructType]:
    """Parse an entities.yaml document; per-entity failures skip that entity
    (reference: logged + continue, /root/reference/src/entity_builder.py:66-69)."""
    config = yaml.safe_load(yaml_text)
    if not config or "entities" not in config:
        return {}
    out: dict[str, T.StructType] = {}
    for entity_name, entity_def in (config.get("entities") or {}).items():
        try:
            out.update(build_entity_struct(entity_name, entity_def))
        except Exception:  # noqa: BLE001 — skip bad entities, keep the rest
            continue
    return out


def validate_entities_yaml(yaml_text: str) -> list[str]:
    """Validation pass mirroring /root/reference/src/entity_builder.py:174-233."""
    errors: list[str] = []
    try:
        config = yaml.safe_load(yaml_text)
    except yaml.YAMLError as e:
        return [f"YAML parse error: {e}"]
    if not config:
        return ["Empty YAML file"]
    if "entities" not in config:
        return ["Missing 'entities' key in YAML"]
    for entity_name, entity_def in (config.get("entities") or {}).items():
        if not entity_name[0].isupper():
            errors.append(f"Entity '{entity_name}': name should start with uppercase")
        if not entity_def:
            errors.append(f"Entity '{entity_name}': empty definition")
            continue
        fields = entity_def.get("fields", {})
        if not fields:
            errors.append(f"Entity '{entity_name}': no fields defined")
            continue
        for field_name, field_def in fields.items():
            if not field_name.isidentifier():
                errors.append(
                    f"Entity '{entity_name}': invalid field name '{field_name}'"
                )
            if isinstance(field_def, dict):
                type_str = field_def.get("type", "str | None")
                if type_str not in SUPPORTED_TYPES:
                    errors.append(
                        f"Entity '{entity_name}.{field_name}': "
                        f"unsupported type '{type_str}'"
                    )
    return errors


# built-ins, /root/reference/src/entities.py:9-38
_ADDRESS_DEF = {
    "fields": {
        "street": "str | None",
        "city": "str | None",
        "state": "str | None",
        "postal_code": "str | None",
        "country": "str | None",
        "raw_text": {"type": "str", "required": True},
        "address_type": "str | None",
    },
    "create_list": False,
}

BUILTIN_ENTITIES: dict[str, T.StructType] = {}
BUILTIN_ENTITIES.update(build_entity_struct("AddressEntity", _ADDRESS_DEF))
BUILTIN_ENTITIES["AddressEntityList"] = T.StructType(
    [
        T.StructField(
            "addresses", T.ArrayType(BUILTIN_ENTITIES["AddressEntity"]), False
        )
    ]
)


def entity_registry(yaml_text: str | None = None) -> dict[str, T.StructType]:
    """Built-ins merged with YAML entities (YAML wins on name clash),
    /root/reference/src/entities.py:46-49."""
    custom = load_entities_from_yaml(yaml_text) if yaml_text else {}
    return {**BUILTIN_ENTITIES, **custom}


def empty_struct_literal(schema: T.StructType) -> Column:
    """The 'empty model' literal: every field null (nested arrays -> empty
    array, nested structs recursed)."""
    cols = []
    for f in schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            cols.append(
                F.array().cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return F.struct(*cols)


def parse_entity_json(col: Column, schema: T.StructType) -> Column:
    """F6: JSON string -> typed struct; malformed input never fails the row —
    it becomes the empty model (reference
    /root/reference/src/entity_extraction.py:93-97)."""
    parsed = F.from_json(col, schema)
    return F.coalesce(parsed, empty_struct_literal(schema))
