"""CCITT Group 4 (T.6) codec + round-4 scanned-document PDF shapes:
sub-8-bit gray, /Decode remaps, /ImageMask, RunLengthDecode, CCITTFax.

Verification strategy: encoder/decoder round-trips (structured, random,
boundary bitmaps) PLUS structural audits of the T.4 Huffman tables —
prefix-freeness and exact code counts per color — which catch table
transcription errors that a symmetric round-trip cannot (a wrong code
shared by encoder and decoder still round-trips). Cross-engine validation
against pypdfium2 runs when importable (not in this container).
"""

from __future__ import annotations

import numpy as np
import pytest

from ner_ocr_spark import ccitt, pdfio


def _rng():
    return np.random.default_rng(29)


# -- codec round-trips -------------------------------------------------------


@pytest.mark.parametrize("name,arr", [
    ("all_white", np.zeros((12, 64), np.uint8)),
    ("all_black", np.ones((12, 64), np.uint8)),
    ("single_pixel", np.eye(7, 9, dtype=np.uint8)),
    ("odd_width", (_rng().random((23, 61)) < 0.3).astype(np.uint8)),
    ("dense", (_rng().random((31, 80)) < 0.5).astype(np.uint8)),
    ("stripes", np.tile(np.array([0, 1] * 40, np.uint8), (20, 1))),
    ("wide_runs", np.repeat(
        _rng().integers(0, 2, (8, 40)).astype(np.uint8), 70, axis=1)),
])
def test_g4_roundtrip(name, arr):
    dec = ccitt.decode_g4(ccitt.encode_g4(arr), arr.shape[1], arr.shape[0])
    assert np.array_equal(dec, arr), name


def test_g4_roundtrip_textlike():
    """Text-stroke geometry — the shapes pass/vertical/horizontal modes
    actually trade on in scanned documents."""
    a = np.zeros((40, 120), np.uint8)
    a[5:8, 10:110] = 1
    a[15:32, 20:24] = 1
    a[15:32, 60:64] = 1
    a[28:32, 24:60] = 1
    a[36, ::3] = 1
    dec = ccitt.decode_g4(ccitt.encode_g4(a), 120, 40)
    assert np.array_equal(dec, a)


def test_g4_truncated_stream_raises():
    a = (_rng().random((20, 60)) < 0.4).astype(np.uint8)
    enc = ccitt.encode_g4(a)
    with pytest.raises(ccitt.CcittError):
        ccitt.decode_g4(enc[: len(enc) // 3], 60, 20)


# -- table structural audits (catch what round-trip can't) -------------------


def _audit(codes: dict[int, str], n_term: int, n_makeup: int):
    all_codes = list(codes.values())
    assert len(set(all_codes)) == len(all_codes), "duplicate code"
    srt = sorted(all_codes)
    for a, b in zip(srt, srt[1:]):
        assert not b.startswith(a), f"prefix violation: {a} < {b}"
    terms = [r for r in codes if r < 64]
    mks = [r for r in codes if r >= 64]
    assert sorted(terms) == list(range(n_term))
    assert sorted(mks) == [64 * i for i in range(1, n_makeup + 1)]


def test_white_table_structure():
    _audit(ccitt.WHITE_CODES, 64, 27)  # terms 0-63, make-ups 64..1728


def test_black_table_structure():
    _audit(ccitt.BLACK_CODES, 64, 27)


def test_ext_table_structure():
    assert sorted(ccitt.EXT_CODES) == [1792 + 64 * i for i in range(13)]
    # extended make-ups must stay prefix-free against BOTH color tables
    for base in (ccitt.WHITE_CODES, ccitt.BLACK_CODES):
        merged = list(base.values()) + list(ccitt.EXT_CODES.values())
        assert len(set(merged)) == len(merged)
        srt = sorted(merged)
        for a, b in zip(srt, srt[1:]):
            assert not b.startswith(a), f"prefix violation: {a} < {b}"


def test_mode_codes_prefix_free():
    modes = ["0001", "001"] + list(ccitt._MODE_V.values())
    srt = sorted(modes)
    for a, b in zip(srt, srt[1:]):
        assert not b.startswith(a)


def test_cross_engine_when_available():
    """If a second PDF engine is importable, its CCITT decode must agree
    with ours (skips in this container — documented limitation)."""
    pytest.importorskip("pypdfium2")
    a = (_rng().random((30, 90)) < 0.3).astype(np.uint8)
    blob = pdfio.encode_image_pdf([a == 0], ccitt=True)  # True = white
    import pypdfium2 as pdfium

    page = pdfium.PdfDocument(blob)[0]
    rendered = np.asarray(page.render(scale=1.0).to_numpy())
    ours = pdfio.extract_page_images(blob)[0]
    assert np.array_equal(ours < 128, rendered[..., 0] < 128)


# -- PDF-shape round-trips through pdfio -------------------------------------


def test_pdf_ccitt_page_roundtrip():
    ink = (_rng().random((35, 70)) < 0.25)
    blob = pdfio.encode_image_pdf([~ink], ccitt=True)  # bool True = white
    assert b"/CCITTFaxDecode" in blob and b"/K -1" in blob
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page == 0, ink)  # ink -> gray 0


def test_pdf_1bit_flate_roundtrip():
    white = _rng().random((25, 50)) < 0.5
    blob = pdfio.encode_image_pdf([white])
    assert b"/BitsPerComponent 1" in blob
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, np.where(white, 255, 0).astype(np.uint8))


def test_pdf_rle_roundtrip():
    g = np.repeat(_rng().integers(0, 256, (20, 8)), 5, axis=1).astype(np.uint8)
    blob = pdfio.encode_image_pdf([g], rle=True)
    assert b"/RunLengthDecode" in blob
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page, g)


def test_rle_codec_edge_cases():
    for data in (b"", b"a", b"a" * 300, b"abc" * 50,
                 bytes(_rng().integers(0, 256, 1000))):
        assert pdfio._rle_decode(pdfio._rle_encode(data)) == data


def test_pdf_decode_array_inverts_bilevel():
    """/Decode [1 0] — the inverted-bilevel orientation fax scans use."""
    white = _rng().random((10, 40)) < 0.5
    blob = pdfio.encode_image_pdf([white])
    tampered = blob.replace(
        b"/BitsPerComponent 1 ", b"/BitsPerComponent 1 /Decode [1 0] "
    )
    assert tampered != blob
    (page,) = pdfio.extract_page_images(tampered)
    assert np.array_equal(page, np.where(white, 0, 255).astype(np.uint8))


def test_pdf_imagemask_stencil():
    """/ImageMask true: implicit 1-bit, sample 0 paints (black ink)."""
    white = _rng().random((10, 40)) < 0.5
    blob = pdfio.encode_image_pdf([white])
    tampered = blob.replace(
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 ",
        b"/ImageMask true ",
    )
    assert tampered != blob
    (page,) = pdfio.extract_page_images(tampered)
    # sample 0 (False) -> paint -> black; sample 1 -> unpainted -> white
    assert np.array_equal(page, np.where(white, 255, 0).astype(np.uint8))


@pytest.mark.parametrize("bpc", [2, 4])
def test_pdf_sub8bit_gray(bpc):
    """2-/4-bit gray samples (hand-built image dict; the writer emits 1/8
    only): decoded levels scale to 0..255 by maxval."""
    import zlib

    levels = 1 << bpc
    w, h = levels * 3 + 1, 4
    samples = np.tile(np.arange(w) % levels, (h, 1)).astype(np.uint8)
    # pack bpc-bit samples into byte-aligned rows
    bits = ((samples[..., None] >> np.arange(bpc - 1, -1, -1)) & 1).reshape(
        h, w * bpc
    )
    data = zlib.compress(np.packbits(bits.astype(np.uint8), axis=1).tobytes())
    blob = pdfio.encode_image_pdf([np.zeros((h, w), np.uint8)])
    old = blob[blob.index(b"<< /Type /XObject"):blob.index(b"endstream")]
    new = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n%s\n" % (w, h, bpc, len(data), data)
    )
    (page,) = pdfio.extract_page_images(blob.replace(old, new))
    want = np.rint(samples / (levels - 1) * 255).astype(np.uint8)
    assert np.array_equal(page, want)


def test_pdf_indexed_palette_image():
    """[/Indexed /DeviceRGB hival <lookup>] palette images (web/scan
    writers emit these for low-color pages): 4-bit indices resolve through
    the palette, then gray via the shared RGB->gray transform."""
    import zlib

    from ner_ocr_spark import png

    rng = _rng()
    w, h, bpc = 21, 6, 4
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
    bits = ((idx[..., None] >> np.arange(bpc - 1, -1, -1)) & 1).reshape(
        h, w * bpc
    )
    data = zlib.compress(np.packbits(bits.astype(np.uint8), axis=1).tobytes())
    blob = pdfio.encode_image_pdf([np.zeros((h, w), np.uint8)])
    old = blob[blob.index(b"<< /Type /XObject"):blob.index(b"endstream")]
    new = (
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace [/Indexed /DeviceRGB 15 <%s>] /BitsPerComponent %d "
        b"/Filter /FlateDecode /Length %d >>\nstream\n%s\n"
        % (w, h, pal.tobytes().hex().encode(), bpc, len(data), data)
    )
    (page,) = pdfio.extract_page_images(blob.replace(old, new))
    assert np.array_equal(page, png.to_gray(pal[idx]))


def test_g4_property_random_roundtrip():
    """Hypothesis-style sweep: arbitrary bitmap shapes and densities all
    round-trip; any table/mode asymmetry surfaces here."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 90),
        h=st.integers(1, 25),
        density=st.floats(0.0, 1.0),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, density, seed):
        arr = (
            np.random.default_rng(seed).random((h, w)) < density
        ).astype(np.uint8)
        dec = ccitt.decode_g4(ccitt.encode_g4(arr), w, h)
        assert np.array_equal(dec, arr)

    check()


# -- Group 3 (K = 0 pure 1-D and K > 0 mixed) --------------------------------


@pytest.mark.parametrize("eol", [True, False])
def test_g3_1d_roundtrip(eol):
    """K=0 MH lines round-trip with and without EOL markers (PDF
    /EndOfLine both ways)."""
    rng = _rng()
    for arr in (
        (rng.random((17, 73)) < 0.3).astype(np.uint8),
        np.zeros((4, 64), np.uint8),
        np.ones((4, 64), np.uint8),
        np.eye(9, 40, dtype=np.uint8),
    ):
        enc = ccitt.encode_g3(arr, k=0, eol=eol)
        dec = ccitt.decode_g3(enc, arr.shape[1], arr.shape[0], k=0)
        assert np.array_equal(dec, arr)


def test_g3_mixed_roundtrip():
    """K>0 mixed mode: EOL + tag per line, 1-D every k-th line, 2-D
    between — the common fax profile."""
    rng = _rng()
    for k in (1, 2, 4):
        arr = (rng.random((19, 80)) < 0.35).astype(np.uint8)
        enc = ccitt.encode_g3(arr, k=k)
        dec = ccitt.decode_g3(enc, 80, 19, k=k)
        assert np.array_equal(dec, arr), f"k={k}"


def test_g3_property_random_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 70), h=st.integers(1, 15),
        density=st.floats(0.0, 1.0), seed=st.integers(0, 2**31),
        k=st.sampled_from([0, 1, 3]), eol=st.booleans(),
    )
    def check(w, h, density, seed, k, eol):
        arr = (
            np.random.default_rng(seed).random((h, w)) < density
        ).astype(np.uint8)
        enc = ccitt.encode_g3(arr, k=k, eol=eol or k > 0)
        dec = ccitt.decode_g3(enc, w, h, k=k)
        assert np.array_equal(dec, arr)

    check()


@pytest.mark.parametrize("mode,marker", [
    ("g3", b"/K 0"), (2, b"/K 2"), ("g4", b"/K -1"),
])
def test_pdf_ccitt_k_modes_roundtrip(mode, marker):
    ink = (_rng().random((22, 66)) < 0.3)
    blob = pdfio.encode_image_pdf([~ink], ccitt=mode)
    assert marker in blob
    (page,) = pdfio.extract_page_images(blob)
    assert np.array_equal(page == 0, ink)


@pytest.mark.parametrize("eol", [True, False])
def test_g3_byte_align_roundtrip(eol):
    """/EncodedByteAlign: every line starts on a byte boundary; padding
    zeros (and fill-before-EOL) must be transparent to the decoder."""
    arr = (_rng().random((13, 51)) < 0.4).astype(np.uint8)
    enc = ccitt.encode_g3(arr, k=0, eol=eol, byte_align=True)
    dec = ccitt.decode_g3(enc, 51, 13, k=0, byte_align=True)
    assert np.array_equal(dec, arr)


# -- review-pass regressions -------------------------------------------------


@pytest.mark.parametrize("black_is_1,decode,ink_gray", [
    (False, None, 0),        # default chain: black -> sample 0 -> 0.0
    (False, b"[1 0]", 255),  # inverted Decode
    (True, b"[1 0]", 0),     # TIFF-converter pairing: both flips cancel
    (True, None, 255),       # BlackIs1 alone: black -> sample 1 -> 1.0
])
def test_ccitt_blackis1_decode_chain(black_is_1, decode, ink_gray):
    """The full spec sample chain: CCITT color -> /BlackIs1 sample bit ->
    /Decode gray map. All four combinations, incl. the TIFF->PDF pairing
    (BlackIs1 true + Decode [1 0]) the old code silently inverted."""
    ink = (_rng().random((12, 30)) < 0.4)
    blob = pdfio.encode_image_pdf([~ink], ccitt=True)
    old = b"/DecodeParms << /K -1"
    new = old
    if black_is_1:
        new = b"/DecodeParms << /BlackIs1 true /K -1"
    tampered = blob.replace(old, new)
    if decode:
        tampered = tampered.replace(
            b"/Filter /CCITTFaxDecode", b"/Decode %s /Filter /CCITTFaxDecode"
            % decode,
        )
    (page,) = pdfio.extract_page_images(tampered)
    assert np.array_equal(page == ink_gray, ink)
    assert np.array_equal(page == (255 - ink_gray), ~ink)


def test_ccitt_columns_narrower_than_width_rejected():
    ink = (_rng().random((8, 40)) < 0.3)
    blob = pdfio.encode_image_pdf([~ink], ccitt=True)
    tampered = blob.replace(b"/Columns 40", b"/Columns 24")
    with pytest.raises(pdfio.PdfError, match="Columns"):
        pdfio.extract_page_images(tampered)


def test_text_layer_strings_do_not_corrupt_ctm():
    """Searchable-scan shape: a text layer whose STRING operands contain
    `Q`, numbers + `cm`, and `/Im0 Do` lookalikes must not perturb the
    compositor's CTM state (strings are blanked before tokenizing)."""
    rng = np.random.default_rng(3)
    full = rng.integers(0, 256, (40, 50), dtype=np.uint8)
    blob = pdfio.encode_image_pdf([[full[:20], full[20:]]])
    # locate the strip content stream and prepend a hostile text layer
    m = None
    import re as _re
    for m in _re.finditer(rb"stream\n(q 50[^e]*?)\nendstream", blob):
        pass
    assert m, "strip content stream not found"
    old_content = m.group(1)
    text_layer = (
        b"BT /F1 9 Tf (see Q below) Tj "
        b"(1 0 0 1 99 99 cm) Tj <2f496d3020446f> Tj ET "
    )
    new_content = text_layer + old_content
    tampered = blob.replace(
        b"<< /Length %d >>\nstream\n%s" % (len(old_content), old_content),
        b"<< /Length %d >>\nstream\n%s" % (len(new_content), new_content),
    )
    assert tampered != blob
    (page,) = pdfio.extract_page_images(tampered)
    assert np.array_equal(page, full)


def test_rotated_stamp_skipped_not_fatal():
    """A rotated watermark draw alongside axis-aligned scan strips must
    not error the page — the strips still composite."""
    rng = np.random.default_rng(4)
    full = rng.integers(0, 256, (30, 44), dtype=np.uint8)
    blob = pdfio.encode_image_pdf([[full[:15], full[15:]]])
    import re as _re
    m = None
    for m in _re.finditer(rb"stream\n(q 44[^e]*?)\nendstream", blob):
        pass
    assert m
    old_content = m.group(1)
    # rotated re-draw of strip 0 (45 degrees): b,c nonzero
    new_content = old_content + b" q 2 2 -2 2 5 5 cm /Im0 Do Q"
    tampered = blob.replace(
        b"<< /Length %d >>\nstream\n%s" % (len(old_content), old_content),
        b"<< /Length %d >>\nstream\n%s" % (len(new_content), new_content),
    )
    assert tampered != blob
    (page,) = pdfio.extract_page_images(tampered)
    assert np.array_equal(page, full)
