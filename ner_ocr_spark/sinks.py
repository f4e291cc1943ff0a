"""Sinks (SURVEY.md §2.1 S6/S7).

S6 — reference-format JSON sink: serialize span rows per document with the
image-payload columns stripped (/root/reference/src/utils.py:116-142 drops
original_image/bbox_image before json.dump; numpy scalar coercion is free
under Arrow). Output: one JSON object per doc, `{stem}_ocr_results.json`
shape — here a Spark json write of the assembled table (distributed, not a
driver loop).

S7 — results export: one denormalized bundle row per run (doc results +
config + run metadata), the reference UI's export_results
(/root/reference/src/ui/app.py:882-925) as a table write.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_ocr_spark.config import AppConfig, compile_config

# payload columns never serialized (reference strip list,
# /root/reference/src/utils.py:131-135)
PAYLOAD_COLS = ("bbox_image", "original_image", "image_png", "payload")


def strip_payload(df: DataFrame) -> DataFrame:
    """P2: drop image-payload columns before any sink."""
    drop = [c for c in PAYLOAD_COLS if c in df.columns]
    return df.drop(*drop) if drop else df


def write_json_results(assembled: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6: per-document JSON rows (doc_id, spans[, entities]) — the
    reference's `{stem}_ocr_results.json` as a distributed json write."""
    strip_payload(assembled).write.mode(mode).json(path)


def export_results(
    assembled: DataFrame,
    path: str,
    config: AppConfig | None = None,
    run_id: str | None = None,
    mode: str = "overwrite",
) -> None:
    """S7: bundle document results with the run's config (as a JSON string
    column — config is metadata, not data-plane schema)."""
    cfg_json = json.dumps(
        {"config_yaml": compile_config(config or AppConfig()), "run_id": run_id}
    )
    out = strip_payload(assembled).withColumn("run_meta", F.lit(cfg_json))
    out.write.mode(mode).json(path)
