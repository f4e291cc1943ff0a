"""Config round-trip (S8) + JSON sink (S6/S7) tests."""

from __future__ import annotations

import json

from ner_ocr_spark import pipeline, sinks
from ner_ocr_spark.config import AppConfig, compile_config, load_config

REFERENCE_STYLE_YAML = """
ocr:
  max_side_limit: 1200
  ocr_timeout: 300
  use_doc_orientation_classify: false   # reference-only knob: ignored
  device: cpu                           # reference-only knob: ignored
transformer_ocr:
  model: LARGE_HANDWRITTEN              # whole section has no analog
entity_extraction:
  entities: [AddressEntityList, PersonEntityList]
  line_threshold: 12
  gap_threshold: 55
queries:
  - search_type: semantic
    text: baker street
"""


def test_reference_config_loads_with_unknown_keys_ignored():
    cfg = load_config(REFERENCE_STYLE_YAML)
    assert cfg.ocr.max_side_limit == 1200
    assert cfg.ocr.ocr_timeout == 300
    assert cfg.entity_extraction.entities == ["AddressEntityList", "PersonEntityList"]
    assert cfg.entity_extraction.gap_threshold == 55
    assert cfg.queries[0]["search_type"] == "semantic"


def test_config_round_trip():
    cfg = load_config(REFERENCE_STYLE_YAML)
    again = load_config(compile_config(cfg))
    assert again == cfg
    assert load_config("") == AppConfig()


def test_json_sink_strips_payload_and_roundtrips(spark, documents_df, tmp_path):
    assembled = pipeline.run(spark, documents_df.limit(8))
    out = str(tmp_path / "json_out")
    sinks.write_json_results(assembled, out)
    back = spark.read.json(out)
    assert back.count() == 8
    assert set(back.columns) == {"doc_id", "spans"}
    # payload columns are stripped even if present
    with_payload = assembled.withColumn("image_png", assembled.doc_id.cast("binary"))
    assert "image_png" not in sinks.strip_payload(with_payload).columns


def test_export_results_bundles_config(spark, documents_df, tmp_path):
    assembled = pipeline.run(spark, documents_df.limit(4))
    out = str(tmp_path / "export")
    cfg = load_config(REFERENCE_STYLE_YAML)
    sinks.export_results(assembled, out, config=cfg, run_id="r42")
    back = spark.read.json(out)
    meta = json.loads(back.select("run_meta").first()["run_meta"])
    assert meta["run_id"] == "r42"
    assert "max_side_limit: 1200" in meta["config_yaml"]
