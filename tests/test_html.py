"""HTML main-content extraction (north rule: "HTML boilerplate strip,
DOM heuristics") — kernel units + Spark operator plan gate. The full
value check runs through the driver oracle (`html_main`): the wrapped
page must round-trip back to the source text exactly."""

from __future__ import annotations

import numpy as np
import pytest

from ner_ocr_spark import htmlx

SF = "/root/testdata/sf0.01"

PAGE = """<html><head><title>T</title>
<script>var p = '<p>decoy</p>'; if (a < b) {}</script>
<style>.x { color: red; }</style></head><body>
<nav class="nav"><a href="/">Home</a> <a href="/a">About</a></nav>
<div class="sidebar"><a href="#">Ad one</a> <a href="#">Ad two</a> buy</div>
<div id="main" class="article content">
  <h1>The   Headline</h1>
  <p>First paragraph, with &amp; entities &lt;kept&gt;, and commas, plenty.</p>
  <p>Second   paragraph
     spans source lines.</p>
</div>
<footer><a href="#">Contact</a> &copy; corp</footer></body></html>"""


def test_boilerplate_stripped_content_kept():
    out = htmlx.main_text(PAGE)
    assert out == (
        "The Headline\n"
        "First paragraph, with & entities <kept>, and commas, plenty.\n"
        "Second paragraph spans source lines."
    )


def test_script_style_never_leak():
    out = htmlx.main_text(PAGE)
    assert "decoy" not in out and "color" not in out


def test_link_density_demotes_link_farms():
    page = (
        '<body><div class="big"><a href="1">one long link text here</a> '
        '<a href="2">another long link text here</a> '
        '<a href="3">third long link text right here</a></div>'
        "<div><p>Short real sentence, with substance, standing alone.</p>"
        "</div></body>"
    )
    assert htmlx.main_text(page) == (
        "Short real sentence, with substance, standing alone."
    )


def test_class_priors_break_text_mass_ties():
    page = (
        '<body><div class="comment">Equal length filler text here one.</div>'
        '<div class="article">Equal length filler text here two.</div></body>'
    )
    assert htmlx.main_text(page) == "Equal length filler text here two."


def test_entities_and_numeric_refs():
    assert htmlx.unescape("&amp;&lt;&gt;&quot;&#65;&#x42;&nbsp;&bogus;") == (
        '&<>"AB &bogus;'
    )


def test_implied_closes_and_malformed_tags_tolerated():
    page = ("<body><div><p>one<p>two<li>three"
            "<p>four </div extra junk> <p>tail</body>")
    out = htmlx.main_text(page)
    for word in ("one", "two", "three", "four"):
        assert word in out
    # each implied-closed block lands on its own line
    assert "one\ntwo" in out


def test_garbage_inputs_never_raise():
    for blob in ("", None, "plain words only", "<", "<<<>>>",
                 "<a href='x", "<div><div><div>", "\x00\xff binary-ish",
                 "<p>" * 2000):
        htmlx.main_text(blob)  # must not raise
    rng = np.random.default_rng(7)
    for _ in range(25):
        raw = bytes(rng.integers(0, 256, 300, dtype=np.uint8).tolist())
        htmlx.main_text(raw)  # bytes garbage must not raise either


def test_spark_operator_is_map_only(spark):
    import __spark_entry__ as e

    df = e.q_html_main(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "Python" in plan  # the kernel stage


def test_spark_roundtrip_sample(spark):
    """Spot value check in the gate (the driver oracle covers all rows)."""
    import re

    import __spark_entry__ as e

    got = {r["doc_id"]: r["main_text"]
           for r in e.q_html_main(spark, SF).filter("doc_id < 20").collect()}
    src = {r["doc_id"]: r["text"]
           for r in spark.read.parquet(f"{SF}/documents.parquet")
           .filter("doc_id < 20").collect()}
    assert len(got) == 20
    for did, text in src.items():
        want = f"DOC {did}\n" + re.sub(r"[ \t\n\x0B\f\r]+", " ", text).strip()
        assert got[did] == want


def test_html_span_kind_interleaved_end_to_end(spark):
    """kind='html' is a first-class span kind: raw markup spans extract
    their MAIN CONTENT (boilerplate stripped, entities decoded), feed the
    same normalizer as text spans, and keep their interleaved position
    under span-sequence equality — one document mixing text + html +
    media."""
    from ner_ocr_spark import corpus, pipeline
    from ner_ocr_spark.kernels.normalize import normalize_text
    from tests.conftest import DOC_SCHEMA

    ref = "media/html-e2e/0"
    truth = [normalize_text(t) for t in corpus.media_truth_text(ref)]
    html = (
        '<html><head><script>var x = "<p>no</p>";</script></head><body>'
        '<nav class="nav"><a href="/">Home</a><a href="/a">About</a></nav>'
        '<div id="c" class="content"><p>Embedded &amp; extracted, main'
        " content   wins.</p></div>"
        '<footer><a href="#">Contact</a></footer></body></html>'
    )
    docs = spark.createDataFrame(
        [{
            "doc_id": "h0",
            "spans": [
                {"kind": "text", "text": "LEADING TEXT", "media_ref": None,
                 "offset": 0},
                {"kind": "html", "text": html, "media_ref": None,
                 "offset": 1},
                {"kind": "media", "text": None, "media_ref": ref,
                 "offset": 2},
                {"kind": "text", "text": "TRAILING TEXT", "media_ref": None,
                 "offset": 3},
            ],
        }],
        DOC_SCHEMA,
    )
    out = pipeline.run(spark, docs)
    spans = {r["doc_id"]: r["spans"] for r in out.collect()}["h0"]
    got = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    want = (
        [("text", normalize_text("LEADING TEXT"), None),
         ("html", normalize_text("Embedded & extracted, main content wins."),
          None)]
        + [("media", t, ref) for t in truth]
        + [("text", normalize_text("TRAILING TEXT"), None)]
    )
    assert got == want
