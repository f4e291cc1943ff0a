"""PDF dispatch + 1:N page rasterization (reference parity:
/root/reference/src/pdf_processing.py:21-73 zoom/max_num_imgs,
/root/reference/src/bounding_box.py:300-303 '.pdf' dispatch). A
deterministic fake rasterizer exercises the pluggable-backend pipeline
shape here; tests/test_pdfio.py drives GENUINE PDF bytes through the
default pdfio extractor. The disabled path (pdf_rasterizer=None) must
degrade to error rows, never crash."""

from __future__ import annotations

from ner_ocr_spark import pipeline
from ner_ocr_spark.kernels.normalize import normalize_text
from tests.conftest import DOC_SCHEMA

PAGE_LINES = [
    ["ALICE COOPER MET BOB STONE", "IN LONDON TODAY"],  # page 0
    ["THE SECOND PAGE", "HAS MORE TEXT"],      # page 1
    ["FINAL PAGE HERE"],                        # page 2
]


def _make_fake_rasterizer():
    """Self-contained closure: cloudpickle ships it by value to executors
    (a module-level function in tests/ would pickle by reference and fail
    to import worker-side)."""
    page_lines = PAGE_LINES

    def fake_rasterizer(blob: bytes, zoom: float) -> list[bytes]:
        import numpy as np

        from ner_ocr_spark import font
        from ner_ocr_spark.png import encode_gray

        assert blob.startswith(b"%PDF-fake"), "rasterizer got non-pdf bytes"
        out = []
        for lines in page_lines:
            page = font.render_lines(lines, scale=3, margin=10)
            gray = np.where(page == 0, np.uint8(40), np.uint8(210))
            out.append(encode_gray(gray))
        return out

    return fake_rasterizer


fake_rasterizer = _make_fake_rasterizer()


def _docs(spark):
    rows = [{
        "doc_id": "p0",
        "spans": [
            {"kind": "text", "text": "INTRO TEXT SPAN", "media_ref": None, "offset": 0},
            {"kind": "pdf", "text": None, "media_ref": "store/report.pdf", "offset": 1},
            {"kind": "text", "text": "CLOSING SPAN", "media_ref": None, "offset": 2},
        ],
    }]
    return spark.createDataFrame(rows, DOC_SCHEMA)


# lambda (not def): cloudpickle ships it by value, executors never import tests/
_resolver = lambda ref: b"%PDF-fake:" + ref.encode()  # noqa: E731


def test_pdf_pages_in_order(spark):
    out = pipeline.run(spark, _docs(spark), blob_resolver=_resolver,
                       pdf_rasterizer=fake_rasterizer)
    spans = {r["doc_id"]: r["spans"] for r in out.collect()}["p0"]
    want = (
        [("text", "INTRO TEXT SPAN", None)]
        + [("pdf", normalize_text(line), "store/report.pdf")
           for page in PAGE_LINES for line in page]
        + [("text", "CLOSING SPAN", None)]
    )
    got = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    assert got == want


def test_pdf_max_pages_truncates(spark):
    out = pipeline.extract_spans(
        _docs(spark), blob_resolver=_resolver,
        pdf_rasterizer=fake_rasterizer, pdf_max_pages=2, with_ner=False,
    )
    pdf_rows = out.filter("kind = 'pdf'").collect()
    # pages 0 and 1 only: 2 + 2 lines
    assert len(pdf_rows) == 4
    assert {r["line_idx"] // 100000 for r in pdf_rows} == {0, 1}


def test_pdf_without_backend_absorbs_errors(spark):
    """Branch explicitly disabled (pdf_rasterizer=None): pdf spans ride the
    media branch, the image sniff rejects the pdf bytes, and the doc still
    assembles (minus the span). The default is now 'auto' (pdfio fallback),
    so None is the explicit opt-out."""
    extracted = pipeline.extract_spans(
        _docs(spark), blob_resolver=_resolver, with_ner=True,
        pdf_rasterizer=None,
    )
    err = extracted.filter("error is not null").collect()
    assert len(err) == 1
    assert err[0]["kind"] == "pdf"
    assert err[0]["entities"] is None and err[0]["bio"] is None
    assembled = pipeline.assemble_documents(extracted)
    spans = assembled.collect()[0]["spans"]
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("text", "INTRO TEXT SPAN"), ("text", "CLOSING SPAN")]


def test_pdf_rasterizer_failure_rows(spark):
    def broken(blob, zoom):
        raise RuntimeError("corrupt xref table")

    out = pipeline.extract_spans(
        _docs(spark), blob_resolver=_resolver,
        pdf_rasterizer=broken, with_ner=True,
    )
    err = out.filter("error is not null").collect()
    assert len(err) == 1
    assert "corrupt xref" in err[0]["error"]
    assert err[0]["kind"] == "pdf"


def test_pdf_entities_flow_through_fused_ner(spark):
    out = pipeline.extract_spans(
        _docs(spark), blob_resolver=_resolver,
        pdf_rasterizer=fake_rasterizer, with_ner=True,
    )
    row = out.filter("kind = 'pdf' and line_idx = 0").collect()[0]
    ents = [(e["entity_type"], e["surface"]) for e in row["entities"]]
    assert ("PERSON", "ALICE COOPER") in ents and ("PERSON", "BOB STONE") in ents
