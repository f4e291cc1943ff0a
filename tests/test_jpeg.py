"""Baseline JPEG codec tests + OCR fidelity on JPEG inputs (round-2: the
reference accepts .jpg/.jpeg via cv2, /root/reference/src/utils.py:90;
round 1 had no JPEG path at all)."""

from __future__ import annotations

import numpy as np
import pytest

from ner_ocr_spark import corpus, jpeg
from ner_ocr_spark.imageio import decode_image, decode_image_gray, sniff
from ner_ocr_spark.kernels import ocr
from ner_ocr_spark.png import decode_gray as png_decode_gray


def test_gray_roundtrip_smooth_exact():
    g = np.add.outer(np.arange(48), np.arange(64)).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(g, quality=95))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 1


def test_gray_roundtrip_noise_bounded():
    n = np.random.RandomState(1).randint(0, 256, (33, 41)).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(n, quality=95))
    assert np.abs(dec.astype(int) - n.astype(int)).mean() < 4


@pytest.mark.parametrize("sub", ["444", "420"])
def test_rgb_roundtrip(sub):
    g = np.add.outer(np.arange(40), np.arange(60)).astype(np.uint8)
    img = np.dstack([g, g[::-1], np.roll(g, 7, axis=1)])
    dec = jpeg.decode(jpeg.encode(img, quality=95, subsampling=sub))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    # 4:2:0 loses high-frequency chroma by design; luma stays tight
    assert err.mean() < (6 if sub == "420" else 2)


def test_odd_dimensions_420():
    img = np.random.RandomState(2).randint(0, 256, (37, 53, 3)).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(img, quality=90, subsampling="420"))
    assert dec.shape == img.shape


def test_sniff_and_dispatch():
    g = np.full((9, 9), 77, dtype=np.uint8)
    from ner_ocr_spark.png import encode_gray

    assert sniff(encode_gray(g)) == "png"
    assert sniff(jpeg.encode(g)) == "jpeg"
    assert sniff(b"plain text") == "unknown"
    assert decode_image(jpeg.encode(g, quality=95)).shape == (9, 9)
    with pytest.raises(ValueError):
        decode_image(b"not an image")


def test_decode_rejects_unsupported_coding_processes():
    # lossless (SOF3) and arithmetic (SOF9) must raise distinctly, and a
    # progressive header with no scans is a truncation error, not garbage
    for sof in (0xC3, 0xC9):
        data = bytes([0xFF, 0xD8, 0xFF, sof]) + \
            b"\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
        with pytest.raises(ValueError, match="unsupported JPEG coding"):
            jpeg.decode(data)
    trunc = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="no SOS"):
        jpeg.decode(trunc)


@pytest.mark.parametrize("i", range(3))
def test_ocr_exact_on_jpeg_pages(i):
    """Re-encoding a corpus page as quality-95 JPEG keeps OCR span output
    exact: Otsu binarization absorbs the (bounded) DCT error between ink
    and background levels."""
    ref = f"doc{i:08d}/m0"
    truth = "\n".join(corpus.media_truth_text(ref))
    gray = png_decode_gray(corpus.render_media_blob(ref))
    blob = jpeg.encode(gray, quality=95)
    assert decode_image_gray(blob).shape == gray.shape
    got, score = ocr.ocr_text(blob)
    assert got == truth
    assert score > 0.8


def test_ocr_error_absorption_truncated_jpeg():
    g = np.full((32, 32), 200, dtype=np.uint8)
    blob = jpeg.encode(g, quality=90)
    assert ocr.ocr_text(blob[: len(blob) // 2]) == ("", 0.0)


def test_fill_bytes_before_marker():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    g = np.add.outer(np.arange(16), np.arange(16)).astype(np.uint8)
    enc = jpeg.encode(g, quality=95)
    padded = enc[:2] + b"\xff\xff" + enc[2:]
    assert np.array_equal(jpeg.decode(padded), jpeg.decode(enc))


def test_gray_with_nontrivial_sampling_factors():
    """A single-component scan is non-interleaved per T.81 A.2 — the SOF
    sampling factors (legally e.g. 0x22 for gray) must be ignored."""
    g = np.add.outer(np.arange(24), np.arange(40)).astype(np.uint8)
    enc = bytearray(jpeg.encode(g, quality=95))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    hv_off = sof + 2 + 2 + 6 + 1  # marker+len+prec+h+w+ncomp+cid -> hv byte
    assert enc[hv_off] == 0x11
    enc[hv_off] = 0x22
    assert np.array_equal(jpeg.decode(bytes(enc)), jpeg.decode(jpeg.encode(g, quality=95)))


