"""Fuzzy scorer + positional/semantic search operator tests
(reference semantics /root/reference/src/rpa.py)."""

from __future__ import annotations

import pytest

from ner_ocr_spark.kernels.fuzzy import partial_ratio, score
from ner_ocr_spark.operators.search import search


def test_partial_ratio_basics():
    assert partial_ratio("abc", "abc") == 1.0
    assert partial_ratio("abc", "xxabcxx") == 1.0  # substring -> 1
    assert partial_ratio("", "") == 1.0
    assert partial_ratio("a", "") == 0.0
    assert 0.0 < partial_ratio("abcd", "abxd") < 1.0
    # symmetric in length handling
    assert partial_ratio("xxabcxx", "abc") == 1.0


def test_score_case_insensitive():
    assert score("BAKER STREET", "baker street") == 1.0
    assert score("THE BAKER STREET HOUSE", "baker street") == 1.0


@pytest.fixture(scope="module")
def regions(spark):
    rows = [
        # doc, page, idx, text, x1, y1, x2, y2
        ("d1", 0, 0, "BAKER STREET 221B", 0.0, 0.0, 100.0, 20.0),
        ("d1", 0, 1, "NEARBY BOX", 120.0, 0.0, 180.0, 20.0),   # within pad 50
        ("d1", 0, 2, "FAR AWAY", 400.0, 400.0, 500.0, 420.0),  # outside pad
        ("d1", 1, 0, "OTHER PAGE NEAR", 120.0, 0.0, 180.0, 20.0),  # page differs
        ("d2", 0, 0, "UNRELATED TEXT", 0.0, 0.0, 50.0, 10.0),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, page int, region_idx int, text string, "
        "x1 double, y1 double, x2 double, y2 double",
    )


def test_positional_search(regions):
    out = search(regions, "positional", x1=110.0, y1=0.0, x2=200.0, y2=30.0)
    got = {(r["doc_id"], r["page"], r["region_idx"]) for r in out.collect()}
    assert got == {("d1", 0, 1), ("d1", 1, 0)}
    # swapped coords normalize (reference min/max, rpa.py:275-279)
    out2 = search(regions, "positional", x1=200.0, y1=30.0, x2=110.0, y2=0.0)
    assert {(r["doc_id"], r["page"], r["region_idx"]) for r in out2.collect()} == got


def test_semantic_search_neighbourhood(regions):
    out = search(
        regions, "semantic", task="find address",
        text="baker street", threshold=0.75, search_padding=50.0,
    )
    rows = out.collect()
    got = {(r["doc_id"], r["page"], r["region_idx"]) for r in rows}
    # the match itself + its padded neighbour; NOT the far box, NOT the
    # same-coords box on another page, NOT other docs
    assert got == {("d1", 0, 0), ("d1", 0, 1)}
    assert all(r["search_type"] == "semantic" for r in rows)
    assert all(r["search_task"] == "find address" for r in rows)


def test_semantic_search_no_matches(regions):
    out = search(regions, "semantic", text="zzzqqq", threshold=0.9)
    assert out.count() == 0


def test_unknown_search_type(regions):
    with pytest.raises(ValueError):
        search(regions, "radial")
