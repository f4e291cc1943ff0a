"""Workbench stage-DAG tests (reference UI semantics, SURVEY.md §3.3)."""

from __future__ import annotations

import pytest

from ner_ocr_spark.workbench import StageNotReadyError, Workbench


@pytest.fixture(scope="module")
def wb(spark, documents_df):
    w = Workbench()
    w.load(documents_df.limit(12))
    return w


def test_stage_order_enforced(wb):
    fresh = Workbench()
    with pytest.raises(StageNotReadyError):
        fresh.run_ocr()
    with pytest.raises(StageNotReadyError):
        wb2 = Workbench()
        wb2.run_search("positional", x1=0, y1=0, x2=10, y2=10)


def test_ocr_then_search_then_entities(wb):
    ocr_rows = wb.run_ocr()
    assert ocr_rows.count() > 0
    hits = wb.run_search("semantic", text="baker street", threshold=0.8,
                         search_padding=30.0)
    assert hits.count() >= 0
    ents = wb.run_entities()
    assert "entities" in ents.columns and "page_text" in ents.columns
    assert wb.completed() == ["load", "ocr", "search", "entities"]


def test_rerun_ocr_invalidates_downstream(wb):
    wb.run_ocr()
    wb.run_search("positional", x1=0.0, y1=0.0, x2=1e6, y2=1e6)
    assert "search" in wb.completed()
    wb.run_ocr()  # re-run resets search/enhance/entities
    assert wb.completed() == ["load", "ocr"]
    with pytest.raises(StageNotReadyError):
        wb.results("search")


def test_enhance_requires_search_and_preserves_rows(wb):
    wb.run_ocr()
    with pytest.raises(StageNotReadyError):
        wb.run_enhancement()
    wb.run_search("positional", x1=0.0, y1=0.0, x2=1e6, y2=1e6)
    before = wb.results("ocr").count()
    enhanced = wb.run_enhancement()
    assert enhanced.count() == before  # refine rewrites, never drops/dups
