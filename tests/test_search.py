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


def test_prefilter_fast_keeps_ocr_noisy_matches(spark):
    """Round-2 self-review catch: OCR confusions (w->vv, m->rn) score
    >= 0.8 but contain no verbatim query token except one — the fast gate
    must still pass them (4-gram token presence, not verbatim tokens)."""
    from pyspark.sql import functions as F

    from ner_ocr_spark.operators.search import fuzzy_prefilter_expr

    noisy = [
        (0, "vvindow rnerge spark region header"),
        (1, "wlndow merqe spark"),
        (2, "totally unrelated text zzz"),
    ]
    df = spark.createDataFrame(noisy, "i int, text string")
    kept = {r["i"] for r in df.filter(
        fuzzy_prefilter_expr(F.col("text"), "window merge spark", 0.8)
    ).collect()}
    assert 0 in kept and 1 in kept
    assert 2 not in kept
    for _, t in noisy[:2]:
        assert score(t, "window merge spark") >= 0.8  # they ARE true matches


def test_prefilter_admissible_property():
    """The JVM gate is a true upper bound on partial_ratio: whenever the
    real score clears the threshold, the gate must pass (no false
    negatives, ever)."""
    from collections import Counter

    cases = [
        ("window merge spark", "the window merge operator", 0.8),
        ("baker street", "BAKER STREET 221B", 0.75),
        ("baker street", "bkaer stret", 0.6),
        ("abc", "xyz", 0.5),
        ("query", "", 0.8),
        ("", "anything", 0.8),
        ("aaa", "aaaaaaaaa", 0.9),
        ("spark sql", "sql spark", 0.7),
    ]
    for q, t, thr in cases:
        ql, tl = q.lower(), t.lower()
        qc, tc = Counter(ql), Counter(tl)
        inter = sum(min(n, tc[c]) for c, n in qc.items())
        shorter = min(len(ql), len(tl))
        gate = (not ql) or thr <= 0 or inter * (2.0 - thr) >= thr * shorter
        if score(t, q) >= thr:
            assert gate, (q, t, thr)


def test_prefilter_keeps_semantics_and_bounds_udf(spark):
    """semantic_query results are IDENTICAL with the prefilter in place,
    and on a corpus-shaped region table >=90% of rows are eliminated
    before the Arrow UDF (round-1 scale fix #3)."""
    from pyspark.sql import functions as F

    from ner_ocr_spark.operators.search import (
        fuzzy_prefilter_expr, fuzzy_score_udf, semantic_query,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    regs = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("page"),
        F.col("doc_id").cast("int").alias("region_idx"),
        F.substring("text", 1, 40).alias("text"),
        (F.col("doc_id") % 100).cast("double").alias("x1"),
        ((F.col("doc_id") * 3) % 100).cast("double").alias("y1"),
        ((F.col("doc_id") % 100) + 20).cast("double").alias("x2"),
        (((F.col("doc_id") * 3) % 100) + 10).cast("double").alias("y2"),
    )
    query, thr = "window merge spark", 0.8
    total = regs.count()
    kept = regs.filter(fuzzy_prefilter_expr(F.col("text"), query, thr)).count()
    # ~89%: the noise-robust 4-gram token gate trades the last percent of
    # elimination for OCR-noise recall (verbatim tokens hit 90% but
    # dropped 'vvindow rnerge spark'-style true matches)
    assert kept <= 0.12 * total, f"prefilter kept {kept}/{total}"
    # ground truth: score EVERY row with the UDF, no prefilter
    truth = {
        (r["doc_id"], r["region_idx"])
        for r in regs.withColumn("s", fuzzy_score_udf(query)(F.col("text")))
        .filter(F.col("s") >= thr).collect()
    }
    got_matches = {
        (r["doc_id"], r["region_idx"])
        for r in regs.filter(fuzzy_prefilter_expr(F.col("text"), query, thr))
        .withColumn("s", fuzzy_score_udf(query)(F.col("text")))
        .filter(F.col("s") >= thr).collect()
    }
    assert got_matches == truth
    # and the full operator output is plan-shaped right: the Filter sits
    # BELOW the ArrowEvalPython node (prefilter evaluated before Python)
    out = semantic_query(regs, query, threshold=thr, search_padding=15.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    arrow_at = plan.find("ArrowEvalPython")
    assert arrow_at >= 0, plan
    # the replace()-based gate appears in a Filter strictly below Arrow
    filt_at = plan.find("replace(", arrow_at)
    assert filt_at > arrow_at, plan[:2000]
    assert "replace(" not in plan[:arrow_at]
