"""Self-verifying PDF path (round-2 verdict #2): GENUINE PDF bytes flow
through pdf_to_pages / the full pipeline via the from-scratch pdfio
extractor — no pypdfium2, no fake rasterizer. Covers: writer/reader round
trip for Flate and DCT pages, page-tree order, max_num_imgs truncation on
real bytes, the zero-page clean-row guard, and distinct out-of-subset
errors. Reference semantics: /root/reference/src/pdf_processing.py:21-73.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pytest

from ner_ocr_spark import font, jpeg, pdfio, pipeline, png
from ner_ocr_spark.kernels.normalize import normalize_text
from tests.conftest import DOC_SCHEMA

PAGE_LINES = [
    ["ALICE COOPER MET BOB STONE", "IN LONDON TODAY"],  # page 0 (Flate)
    ["THE SECOND PAGE", "HAS MORE TEXT"],               # page 1 (DCT/JPEG)
    ["FINAL PAGE HERE"],                                 # page 2 (Flate)
]


def _page_gray(lines) -> np.ndarray:
    page = font.render_lines(lines, scale=3, margin=10)
    return np.where(page == 0, np.uint8(40), np.uint8(210))


def _fixture_pdf() -> bytes:
    """3-page PDF: pages 0/2 Flate-encoded gray bitmaps, page 1 a real
    JPEG embedded as DCTDecode (the standard scanned-PDF shape)."""
    return pdfio.encode_image_pdf([
        _page_gray(PAGE_LINES[0]),
        jpeg.encode(_page_gray(PAGE_LINES[1]), quality=90),
        _page_gray(PAGE_LINES[2]),
    ])


# -- pure reader/writer ------------------------------------------------------


def test_roundtrip_flate_exact():
    g = (np.arange(40 * 60, dtype=np.uint32) * 37 % 251).astype(np.uint8)
    g = g.reshape(40, 60)
    pages = pdfio.extract_page_images(pdfio.encode_image_pdf([g]))
    assert len(pages) == 1 and np.array_equal(pages[0], g)


def test_roundtrip_dct_matches_jpeg_decode():
    g = (np.arange(48 * 64, dtype=np.uint32) * 53 % 251).astype(np.uint8)
    g = g.reshape(48, 64)
    jb = jpeg.encode(g, quality=90)
    pages = pdfio.extract_page_images(pdfio.encode_image_pdf([jb]))
    assert np.array_equal(pages[0], png.to_gray(jpeg.decode(jb)))


def test_page_tree_order_preserved():
    imgs = [np.full((8, 8 + i), i * 40, dtype=np.uint8) for i in range(4)]
    pages = pdfio.extract_page_images(pdfio.encode_image_pdf(imgs))
    assert [p.shape for p in pages] == [(8, 8 + i) for i in range(4)]
    assert all(np.array_equal(p, i) for p, i in zip(pages, imgs))


def test_zero_page_pdf_is_empty_not_error():
    assert pdfio.extract_page_images(pdfio.encode_image_pdf([])) == []


def test_out_of_subset_errors_are_distinct():
    with pytest.raises(pdfio.PdfError, match="missing %PDF- header"):
        pdfio.extract_page_images(b"not a pdf at all")
    with pytest.raises(pdfio.PdfError, match="no indirect objects"):
        pdfio.extract_page_images(b"%PDF-1.4\njunk")
    # a vector/text page (no image XObject) names the escape hatch
    blob = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 10 10] >>\n"
        b"endobj\n"
        b"trailer\n<< /Size 4 /Root 1 0 R >>\n%%EOF\n"
    )
    with pytest.raises(pdfio.PdfError, match="no image XObject"):
        pdfio.extract_page_images(blob)


def test_encrypted_pdf_rejected():
    blob = pdfio.encode_image_pdf([np.zeros((4, 4), dtype=np.uint8)])
    tampered = blob.replace(
        b"trailer\n<< /Size", b"trailer\n<< /Encrypt 9 0 R /Size"
    )
    with pytest.raises(pdfio.PdfError, match="encrypted"):
        pdfio.extract_page_images(tampered)


def test_reader_survives_xref_damage():
    """Brute-scan parsing: a corrupted xref table does not matter."""
    g = np.full((6, 6), 99, dtype=np.uint8)
    blob = bytearray(pdfio.encode_image_pdf([g]))
    i = bytes(blob).index(b"xref")
    blob[i + 6 : i + 16] = b"X" * 10  # trash the first xref entries
    pages = pdfio.extract_page_images(bytes(blob))
    assert np.array_equal(pages[0], g)


def test_multi_image_page_composites_in_draw_order():
    """Two image XObjects on one page composite like a viewer paints them:
    /Im1 (200) full-page first, then /Im0 (10) over the bottom-left
    quarter — later draws win where they overlap (round-4: the first-
    drawn-wins heuristic became a real CTM-placed compositor)."""
    a = np.full((6, 6), 10, np.uint8)
    b = np.full((6, 6), 200, np.uint8)
    blob = pdfio.encode_image_pdf([a])
    assert b"/Im0 Do" in blob  # fixture content streams are stored raw
    pages = pdfio.extract_page_images(_add_second_image(blob, b))
    page = pages[0]
    # canvas density follows the densest draw: Im0 is 6 px over 3 pt
    # (2 px/pt), so the 6-pt page renders at 12x12
    assert page.shape == (12, 12)
    assert (page[0:6, :] == 200).all()       # top half: Im1 only
    assert (page[6:12, 0:6] == 10).all()     # bottom-left: Im0 over Im1
    assert (page[6:12, 6:12] == 200).all()   # bottom-right: Im1 only


def _add_second_image(blob: bytes, img: np.ndarray) -> bytes:
    """Append an /Im1 image object and rewrite the page (via an appended
    later definition — the brute scan's later-definition-wins rule) so the
    content stream draws /Im1 BEFORE /Im0."""
    h, w = img.shape
    data = zlib.compress(img.tobytes(), 6)
    m = re.search(rb"(\d+) 0 obj\n(<< /Type /Page .*?>>)\nendobj", blob, re.S)
    assert m
    page_num = int(m.group(1))
    next_num = max(int(x) for x in re.findall(rb"(\d+) 0 obj", blob)) + 1
    img_obj = (
        b"%d 0 obj\n<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode "
        b"/Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (next_num, w, h, len(data), data)
    )
    content = b"q %d 0 0 %d 0 0 cm /Im1 Do Q q 3 0 0 3 0 0 cm /Im0 Do Q" % (w, h)
    content_obj = (
        b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (next_num + 1, len(content), content)
    )
    body = m.group(2)
    body = re.sub(rb"/XObject << ([^>]*) >>",
                  b"/XObject << \\1 /Im1 %d 0 R >>" % next_num, body)
    body = re.sub(rb"/Contents \d+ 0 R",
                  b"/Contents %d 0 R" % (next_num + 1), body)
    addendum = (img_obj + content_obj
                + b"%d 0 obj\n" % page_num + body + b"\nendobj\n")
    eof = blob.rindex(b"%%EOF")
    return blob[:eof] + addendum + blob[eof:]


def test_pdf_to_pages_operator_with_real_bytes(spark):
    """The standalone composable operator (rasterize -> F.slice ->
    posexplode_outer) on genuine PDF bytes: page rows in order, truncation
    JVM-side, zero-page doc -> one NULL-image row with NULL error."""
    from pyspark.sql import types as T

    from ner_ocr_spark.operators.pdf import pdf_to_pages
    from ner_ocr_spark.pdfio import pdfio_rasterizer

    blob3 = _fixture_pdf()
    blob0 = pdfio.encode_image_pdf([])
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("span_idx", T.IntegerType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ])
    df = spark.createDataFrame(
        [("d3", 0, "r3", bytearray(blob3)), ("d0", 0, "r0", bytearray(blob0))],
        schema,
    )
    out = pdf_to_pages(df, pdfio_rasterizer, max_num_imgs=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d3 = sorted(by_doc["d3"], key=lambda r: r["page_idx"])
    assert [r["page_idx"] for r in d3] == [0, 1]  # truncated from 3
    assert all(r["error"] is None and r["image_png"] is not None for r in d3)
    assert np.array_equal(
        png.decode(bytes(d3[0]["image_png"])), _page_gray(PAGE_LINES[0])
    )
    (d0,) = by_doc["d0"]
    assert d0["image_png"] is None and d0["error"] is None


# -- end-to-end through the Spark pipeline (genuine bytes, default 'auto') ---


def _docs(spark):
    rows = [{
        "doc_id": "p0",
        "spans": [
            {"kind": "text", "text": "INTRO TEXT SPAN", "media_ref": None, "offset": 0},
            {"kind": "pdf", "text": None, "media_ref": "store/scan.pdf", "offset": 1},
            {"kind": "text", "text": "CLOSING SPAN", "media_ref": None, "offset": 2},
        ],
    }]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _resolver_for(blob: bytes):
    return lambda ref: blob  # closure ships bytes by value to executors


def test_real_pdf_bytes_end_to_end_span_equality(spark):
    out = pipeline.run(
        spark, _docs(spark), blob_resolver=_resolver_for(_fixture_pdf())
    )
    spans = {r["doc_id"]: r["spans"] for r in out.collect()}["p0"]
    want = (
        [("text", "INTRO TEXT SPAN", None)]
        + [("pdf", normalize_text(line), "store/scan.pdf")
           for page in PAGE_LINES for line in page]
        + [("text", "CLOSING SPAN", None)]
    )
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == want


def test_real_pdf_bytes_max_pages_truncates(spark):
    out = pipeline.extract_spans(
        _docs(spark), blob_resolver=_resolver_for(_fixture_pdf()),
        pdf_max_pages=2, with_ner=False,
    )
    pdf_rows = out.filter("kind = 'pdf'").collect()
    assert len(pdf_rows) == 4  # pages 0 and 1 only: 2 + 2 lines
    assert {r["line_idx"] // 100000 for r in pdf_rows} == {0, 1}


def test_zero_page_pdf_clean_row_not_resolver_fallback(spark):
    """ADVICE guard: a parsed zero-page PDF must NOT fall back to decoding
    the raw PDF blob as an image — it emits one clean no-lines row."""
    out = pipeline.extract_spans(
        _docs(spark), blob_resolver=_resolver_for(pdfio.encode_image_pdf([])),
        with_ner=True,
    )
    # the clean no-lines row is blank-filtered downstream; the BUG would
    # surface as a kind='pdf' row with a non-null decode error surviving
    # the filter (error rows always survive) — assert none exists
    assert out.filter("kind = 'pdf'").count() == 0
    assert out.filter("error is not null").count() == 0
    assembled = pipeline.assemble_documents(out)
    spans = assembled.collect()[0]["spans"]
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("text", "INTRO TEXT SPAN"), ("text", "CLOSING SPAN")]


# -- round-4 subset widening: ObjStm, xref streams, predictors ---------------


def _grad() -> np.ndarray:
    return (np.arange(24 * 31, dtype=np.uint32) * 41 % 253).astype(
        np.uint8
    ).reshape(24, 31)


@pytest.mark.parametrize("predictor", [2, 10, 11, 12, 13, 14, 15])
def test_roundtrip_predictor_exact(predictor):
    """TIFF (2) and every PNG predictor tag (10-15; 15 cycles all five row
    filters) round-trip pixel-exact through /DecodeParms."""
    g = _grad()
    blob = pdfio.encode_image_pdf([g], predictor=predictor)
    assert b"/Predictor %d" % predictor in blob
    pages = pdfio.extract_page_images(blob)
    assert len(pages) == 1 and np.array_equal(pages[0], g)


def test_roundtrip_objstm_xref_stream():
    """PDF 1.5 shape: catalog/page-tree dicts live in a /ObjStm container,
    the classic trailer is replaced by a cross-reference STREAM. Both pages
    (Flate + DCT) extract, in order."""
    g = _grad()
    jb = jpeg.encode(_page_gray(PAGE_LINES[1]), quality=90)
    blob = pdfio.encode_image_pdf([g, jb], objstm=True)
    assert b"/ObjStm" in blob and b"/Type /XRef" in blob
    assert b"trailer" not in blob
    pages = pdfio.extract_page_images(blob)
    assert len(pages) == 2
    assert np.array_equal(pages[0], g)
    assert np.array_equal(pages[1], png.to_gray(jpeg.decode(jb)))


def test_objstm_plus_predictor_end_to_end(spark):
    """The full modern-writer shape (ObjStm + xref stream + PNG-predictor
    Flate) flows through the Spark pipeline with span equality."""
    blob = pdfio.encode_image_pdf(
        [_page_gray(lines) for lines in PAGE_LINES], objstm=True, predictor=15
    )
    out = pipeline.run(spark, _docs(spark), blob_resolver=_resolver_for(blob))
    spans = {r["doc_id"]: r["spans"] for r in out.collect()}["p0"]
    want = (
        [("text", "INTRO TEXT SPAN", None)]
        + [("pdf", normalize_text(line), "store/scan.pdf")
           for page in PAGE_LINES for line in page]
        + [("text", "CLOSING SPAN", None)]
    )
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == want


def test_ccitt_bilevel_end_to_end(spark):
    """A Group-4 fax-compressed bilevel scan flows through the full Spark
    pipeline with span equality — the classic scanned-document shape."""
    pages = [_page_gray(lines) > 127 for lines in PAGE_LINES]  # True = white
    blob = pdfio.encode_image_pdf(pages, ccitt=True)
    assert b"/CCITTFaxDecode" in blob
    out = pipeline.run(spark, _docs(spark), blob_resolver=_resolver_for(blob))
    spans = {r["doc_id"]: r["spans"] for r in out.collect()}["p0"]
    want = (
        [("text", "INTRO TEXT SPAN", None)]
        + [("pdf", normalize_text(line), "store/scan.pdf")
           for page in PAGE_LINES for line in page]
        + [("text", "CLOSING SPAN", None)]
    )
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == want


def test_xref_stream_carries_encrypt_rejection():
    """/Encrypt in the xref STREAM dict (no classic trailer present) must
    still fail closed with the distinct encryption error."""
    blob = pdfio.encode_image_pdf([_grad()], objstm=True)
    tampered = blob.replace(b"/Type /XRef /Size",
                            b"/Type /XRef /Encrypt 99 0 R /Size")
    with pytest.raises(pdfio.PdfError, match="encrypted"):
        pdfio.extract_page_images(tampered)


def test_direct_update_overrides_objstm_member():
    """Incremental-update semantics across containers: a direct object
    appended LATER in the file wins over an earlier /ObjStm member with the
    same number."""
    blob = pdfio.encode_image_pdf([_grad()], objstm=True)
    eof = blob.rindex(b"startxref")
    update = b"2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n"
    assert pdfio.extract_page_images(blob[:eof] + update + blob[eof:]) == []


def test_fake_obj_token_inside_stream_payload_is_skipped():
    """Round-3 advice: a byte sequence matching `N G obj` INSIDE a stream
    payload must not shadow the real object of that number (the old
    later-definition-wins scan would have silently dropped the page
    tree)."""
    g = _grad()
    blob = pdfio.encode_image_pdf([g])
    # append a raw (unfiltered) stream whose PAYLOAD contains a parseable
    # fake redefinition of object 2 (the page tree) to zero pages
    fake = b"junk 2 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nmore junk"
    next_num = max(int(x) for x in re.findall(rb"(\d+) 0 obj", blob)) + 1
    extra = (
        b"%d 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (next_num, len(fake), fake)
    )
    eof = blob.rindex(b"%%EOF")
    pages = pdfio.extract_page_images(blob[:eof] + extra + blob[eof:])
    assert len(pages) == 1 and np.array_equal(pages[0], g)


# -- round-4 second wave: multi-strip scanner pages --------------------------


def test_strip_page_roundtrip_exact():
    """The band-scanner shape: a page arriving as stacked image strips
    composites back to the exact original bitmap (CTM-placed, draw order,
    1 px/pt canvas)."""
    rng = np.random.default_rng(5)
    full = rng.integers(0, 256, (60, 80), dtype=np.uint8)
    strips = [full[0:17], full[17:40], full[40:60]]
    blob = pdfio.encode_image_pdf([strips])
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, full)


def test_strip_page_end_to_end(spark):
    """A 4-strip scanned page flows through the full Spark pipeline with
    span equality — the strips must reassemble before OCR sees the page."""
    full = _page_gray(PAGE_LINES[0])
    h = full.shape[0]
    cuts = [0, h // 4, h // 2, 3 * h // 4, h]
    strips = [full[cuts[i]:cuts[i + 1]] for i in range(4)]
    blob = pdfio.encode_image_pdf([strips])
    out = pipeline.run(spark, _docs(spark), blob_resolver=_resolver_for(blob))
    spans = {r["doc_id"]: r["spans"] for r in out.collect()}["p0"]
    want = (
        [("text", "INTRO TEXT SPAN", None)]
        + [("pdf", normalize_text(line), "store/scan.pdf")
           for line in PAGE_LINES[0]]
        + [("text", "CLOSING SPAN", None)]
    )
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == want


def test_strip_page_inside_objstm_pdf():
    """Mode composition: multi-strip page + ObjStm/xref-stream container."""
    rng = np.random.default_rng(9)
    full = rng.integers(0, 256, (30, 40), dtype=np.uint8)
    blob = pdfio.encode_image_pdf([[full[:11], full[11:]]], objstm=True)
    assert b"/ObjStm" in blob
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, full)


def test_inline_image_binary_does_not_fake_draw_ops():
    """An UNDECODABLE BI..ID..EI section (malformed header) must be
    blanked through its terminator — its binary payload must not be
    tokenized as draw operators (phantom cm/Do from compressed bytes)."""
    g = np.full((6, 6), 99, np.uint8)
    blob = pdfio.encode_image_pdf([g])
    # malformed inline image (no /H): payload SPELLS a draw op
    evil = b"BI /W 2 ID \x00/Im0 Do\xff EI "
    old = b"q 6 0 0 6 0 0 cm /Im0 Do Q"
    new = evil + old
    content = old
    assert content in blob
    tampered = blob.replace(
        b"<< /Length %d >>\nstream\n%s" % (len(content), content),
        b"<< /Length %d >>\nstream\n%s" % (len(new), new),
    )
    assert tampered != blob
    (page,) = pdfio.extract_page_images(tampered)
    # exactly one real draw -> native bitmap returned exactly
    assert np.array_equal(page, g)


@pytest.mark.parametrize("rot,k", [(90, -1), (180, 2), (270, 1), (-90, 1)])
def test_page_rotate_attribute(rot, k):
    """/Rotate (clockwise display rotation): scanners emit landscape pages
    this way; the extracted bitmap must come out upright, as the
    reference's pypdfium2 renders it."""
    g = np.arange(6 * 9, dtype=np.uint8).reshape(6, 9)
    blob = pdfio.encode_image_pdf([g])
    tampered = blob.replace(
        b"/Type /Page /Parent", b"/Type /Page /Rotate %d /Parent" % rot
    )
    assert tampered != blob
    (page,) = pdfio.extract_page_images(tampered)
    assert np.array_equal(page, np.rot90(g, k))


def test_page_rotate_inherited_from_pages_node():
    """/Rotate set on the /Pages node applies to every kid (inheritable
    page attribute)."""
    g = np.arange(5 * 8, dtype=np.uint8).reshape(5, 8)
    blob = pdfio.encode_image_pdf([g, g])
    tampered = blob.replace(
        b"/Type /Pages /Kids", b"/Type /Pages /Rotate 180 /Kids"
    )
    assert tampered != blob
    pages = pdfio.extract_page_images(tampered)
    assert len(pages) == 2
    for p in pages:
        assert np.array_equal(p, np.rot90(g, 2))


def test_sub_byte_png_predictor_bilevel():
    """PNG predictor over 1-bit packed rows (Flate+Up on bilevel scans):
    sub-byte depths filter whole bytes at stride 1."""
    import zlib

    white = np.random.default_rng(8).random((14, 37)) < 0.5
    packed = np.packbits(white, axis=1)
    h, rowbytes = packed.shape
    # forward Up filter on the packed bytes
    rows = []
    prev = np.zeros(rowbytes, np.int16)
    for y in range(h):
        r = packed[y].astype(np.int16)
        rows.append(bytes([2]) + ((r - prev) & 0xFF).astype(np.uint8).tobytes())
        prev = r
    data = zlib.compress(b"".join(rows))
    blob = pdfio.encode_image_pdf([white])  # 1-bit flate fixture to edit
    old = blob[blob.index(b"<< /Type /XObject"):blob.index(b"endstream")]
    new = (
        b"<< /Type /XObject /Subtype /Image /Width 37 /Height 14 "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /FlateDecode "
        b"/DecodeParms << /Predictor 12 /Columns 37 /Colors 1 "
        b"/BitsPerComponent 1 >> /Length %d >>\nstream\n%s\n"
        % (len(data), data)
    )
    (page,) = pdfio.extract_page_images(blob.replace(old, new))
    assert np.array_equal(page, np.where(white, 255, 0).astype(np.uint8))


def test_modern_writer_torture_document_end_to_end(spark):
    """One document exercising every round-4 shape at once: ObjStm +
    xref-stream container, a PNG-predictor Flate page, a CCITT G4 bilevel
    page, and a multi-strip page — full pipeline, span equality."""
    g0 = _page_gray(PAGE_LINES[0])
    g1 = _page_gray(PAGE_LINES[1]) > 127          # bilevel -> CCITT G4
    g2 = _page_gray(PAGE_LINES[2])
    h = g2.shape[0]
    strips = [g2[: h // 3], g2[h // 3 : 2 * h // 3], g2[2 * h // 3 :]]
    blob = pdfio.encode_image_pdf(
        [g0, g1, strips], objstm=True, predictor=15, ccitt=True
    )
    for marker in (b"/ObjStm", b"/Type /XRef", b"/Predictor 15",
                   b"/CCITTFaxDecode"):
        assert marker in blob, marker
    out = pipeline.run(spark, _docs(spark), blob_resolver=_resolver_for(blob))
    spans = {r["doc_id"]: r["spans"] for r in out.collect()}["p0"]
    want = (
        [("text", "INTRO TEXT SPAN", None)]
        + [("pdf", normalize_text(line), "store/scan.pdf")
           for page in PAGE_LINES for line in page]
        + [("text", "CLOSING SPAN", None)]
    )
    assert [(s["kind"], s["text"], s["media_ref"]) for s in spans] == want


# -- inline images (BI..ID..EI) ----------------------------------------------


def _content_swap(blob: bytes, new_content: bytes) -> bytes:
    """Replace the (raw) content stream of a single-page writer fixture."""
    m = re.search(rb"<< /Length (\d+) >>\nstream\n(q [^e]*?)\nendstream",
                  blob, re.S)
    assert m, "content stream not found"
    old = b"<< /Length %s >>\nstream\n%s" % (m.group(1), m.group(2))
    new = b"<< /Length %d >>\nstream\n%s" % (len(new_content), new_content)
    out = blob.replace(old, new)
    assert out != blob
    return out


def test_inline_image_page_extracts():
    """A page whose scan is carried INLINE (BI..ID..EI, the fax-converter
    shape) — no XObject draw at all — must extract pixel-exact."""
    import zlib

    g = (np.arange(9 * 13, dtype=np.uint32) * 29 % 251).astype(
        np.uint8).reshape(9, 13)
    payload = zlib.compress(g.tobytes(), 6)
    content = (
        b"q 13 0 0 9 0 0 cm BI /W 13 /H 9 /BPC 8 /CS /G /F /Fl ID "
        + payload + b" EI Q"
    )
    blob = _content_swap(pdfio.encode_image_pdf([np.zeros((9, 13), np.uint8)]),
                         content)
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, g)


def test_inline_image_false_ei_in_payload():
    """Uncompressed inline payload whose PIXELS spell ' EI ': the early
    candidate yields a too-short stream, so decode-verify must advance to
    the true terminator."""
    g = np.full((6, 8), 7, np.uint8)
    g[2, 2:6] = [0x20, 0x45, 0x49, 0x20]  # " EI " inside binary data
    content = (
        b"q 8 0 0 6 0 0 cm BI /W 8 /H 6 /BPC 8 /CS /G ID "
        + g.tobytes() + b" EI Q"
    )
    blob = _content_swap(pdfio.encode_image_pdf([np.zeros((6, 8), np.uint8)]),
                         content)
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, g)


def test_inline_image_composites_with_xobject_strips():
    """An inline header band above an XObject strip: both composite in
    draw order."""
    import zlib

    full = np.arange(20 * 16, dtype=np.uint8).reshape(20, 16)
    band, rest = full[:5], full[5:]
    payload = zlib.compress(band.tobytes(), 6)
    content = (
        b"q 16 0 0 5 0 15 cm BI /W 16 /H 5 /BPC 8 /CS /G /F /Fl ID "
        + payload + b" EI Q "
        b"q 16 0 0 15 0 0 cm /Im0 Do Q"
    )
    base = pdfio.encode_image_pdf([rest])  # Im0 = bottom strip (15 rows)
    blob = _content_swap(base, content)
    blob = blob.replace(b"/MediaBox [0 0 16 15]", b"/MediaBox [0 0 16 20]")
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, full)


def test_inline_image_asciihex_chain():
    """/F [/AHx /Fl] — printable inline-image encoding chains ASCIIHex
    before the binary filter."""
    import zlib

    g = (np.arange(7 * 11, dtype=np.uint32) * 31 % 251).astype(
        np.uint8).reshape(7, 11)
    payload = zlib.compress(g.tobytes(), 6).hex().encode() + b">"
    content = (
        b"q 11 0 0 7 0 0 cm BI /W 11 /H 7 /BPC 8 /CS /G /F [/AHx /Fl] ID "
        + payload + b" EI Q"
    )
    blob = _content_swap(pdfio.encode_image_pdf([np.zeros((7, 11), np.uint8)]),
                         content)
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, g)


def test_bi_inside_string_literal_does_not_eat_draws():
    """' BI ' inside a text-layer STRING literal must not start a phantom
    inline-image segment (which would dead-blank every later draw)."""
    rng = np.random.default_rng(6)
    full = rng.integers(0, 256, (20, 16), dtype=np.uint8)
    blob = pdfio.encode_image_pdf([[full[:10], full[10:]]])
    m = None
    for m in re.finditer(rb"stream\n(q 16[^e]*?)\nendstream", blob):
        pass
    assert m
    old_content = m.group(1)
    new_content = b"BT (see BI section) Tj ET " + old_content
    tampered = blob.replace(
        b"<< /Length %d >>\nstream\n%s" % (len(old_content), old_content),
        b"<< /Length %d >>\nstream\n%s" % (len(new_content), new_content),
    )
    assert tampered != blob
    (page,) = pdfio.extract_page_images(tampered)
    assert np.array_equal(page, full)


def test_ahx_chain_with_array_decodeparms_predictor():
    """/Filter [/AHx /Fl] + /DecodeParms [null << /Predictor ... >>]: the
    AHx slot must peel WITH its filter so the predictor parms apply."""
    import zlib

    g = (np.arange(8 * 12, dtype=np.uint32) * 19 % 251).astype(
        np.uint8).reshape(8, 12)
    filtered = pdfio._predictor_apply(g, 12)
    payload = zlib.compress(filtered, 6).hex().encode() + b">"
    content = (
        b"q 12 0 0 8 0 0 cm BI /W 12 /H 8 /BPC 8 /CS /G /F [/AHx /Fl] "
        b"/DP [null << /Predictor 12 /Columns 12 /Colors 1 "
        b"/BitsPerComponent 8 >>] ID " + payload + b" EI Q"
    )
    base = pdfio.encode_image_pdf([np.zeros((8, 12), np.uint8)])
    m = re.search(rb"<< /Length (\d+) >>\nstream\n(q [^e]*?)\nendstream",
                  base, re.S)
    tampered = base.replace(
        b"<< /Length %s >>\nstream\n%s" % (m.group(1), m.group(2)),
        b"<< /Length %d >>\nstream\n%s" % (len(content), content),
    )
    (page,) = pdfio.extract_page_images(tampered)
    assert np.array_equal(page, g)
