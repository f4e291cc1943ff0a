"""YAML -> StructType entity compiler parity tests (FIXTURES.md §4;
reference semantics /root/reference/src/entity_builder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from ner_ocr_spark import schema as S

YAML_DOC = """
entities:
  PersonEntity:
    description: "Data model for a person entity"
    create_list: true
    fields:
      first_name:
        type: "str | None"
        description: "Person's first name"
      age:
        type: "int | None"
      height:
        type: "float"
        required: true
      active:
        type: "bool | None"
      raw_text:
        type: "str"
        description: "Raw text"
        required: true
  Company:
    create_list: true
    fields:
      name: "str | None"
  BadEntity: {}
"""


def test_supported_types_compile():
    reg = S.load_entities_from_yaml(YAML_DOC)
    p = reg["PersonEntity"]
    assert isinstance(p, T.StructType)
    by_name = {f.name: f for f in p.fields}
    assert isinstance(by_name["first_name"].dataType, T.StringType)
    assert by_name["first_name"].nullable
    assert isinstance(by_name["age"].dataType, T.LongType)
    assert isinstance(by_name["height"].dataType, T.DoubleType)
    assert not by_name["height"].nullable  # required
    assert isinstance(by_name["active"].dataType, T.BooleanType)
    assert not by_name["raw_text"].nullable


def test_list_wrapper_pluralisation():
    # reference branch order: 'y' wins before 'Entity'
    # (/root/reference/src/entity_builder.py:146-153)
    assert S.list_wrapper_field("PersonEntity") == "personEntities"
    assert S.list_wrapper_field("Company") == "companies"
    assert S.list_wrapper_field("Thing") == "things"
    reg = S.load_entities_from_yaml(YAML_DOC)
    pl = reg["PersonEntityList"]
    assert pl.fields[0].name == "personEntities"
    assert isinstance(pl.fields[0].dataType, T.ArrayType)
    assert reg["CompanyList"].fields[0].name == "companies"


def test_bad_entity_skipped_good_kept():
    reg = S.load_entities_from_yaml(YAML_DOC)
    assert "BadEntity" not in reg
    assert "PersonEntity" in reg


def test_builtin_registry_merge():
    reg = S.entity_registry(YAML_DOC)
    assert "AddressEntity" in reg and "AddressEntityList" in reg
    assert reg["AddressEntityList"].fields[0].name == "addresses"
    assert "PersonEntity" in reg


def test_validate_yaml():
    errs = S.validate_entities_yaml("entities:\n  lower:\n    fields:\n      x:\n        type: 'datetime'\n")
    assert any("uppercase" in e for e in errs)
    assert any("unsupported type" in e for e in errs)
    assert S.validate_entities_yaml("") == ["Empty YAML file"]
    assert S.validate_entities_yaml("foo: 1") == ["Missing 'entities' key in YAML"]


def test_from_json_empty_model_fallback(spark):
    reg = S.load_entities_from_yaml(YAML_DOC)
    person = reg["PersonEntity"]
    df = spark.createDataFrame(
        [("ok", '{"first_name": "ADA", "age": 36, "height": 1.7, "raw_text": "x"}'),
         ("bad", "{not json at all"),
         ("null", None)],
        "tag string, payload string",
    )
    out = df.select("tag", S.parse_entity_json(F.col("payload"), person).alias("e")).collect()
    by_tag = {r["tag"]: r["e"] for r in out}
    assert by_tag["ok"]["first_name"] == "ADA" and by_tag["ok"]["age"] == 36
    # malformed -> empty model, never a failed row
    # (/root/reference/src/entity_extraction.py:93-97)
    assert by_tag["bad"] is not None and by_tag["bad"]["first_name"] is None
    assert by_tag["null"] is not None
