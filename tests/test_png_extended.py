"""Extended PNG decode coverage (round-2 verdict #2 codec breadth):
bit depths 1/2/4/16 and Adam7 interlace.

Fixtures are written by THIS file's own minimal writer (pass-splitting,
bit-packing, 16-bit big-endian) — independent code from the decoder's
scatter/unpack, so the two cannot share a symmetric bug; interlaced
fixtures additionally must decode identically to their sequential twins.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ner_ocr_spark import corpus, png
from ner_ocr_spark.kernels import ocr

_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _pack_rows(samples: np.ndarray, depth: int) -> bytes:
    """(h, w*ch) uint8 samples -> filtered (filter 0) scanline bytes."""
    h, n = samples.shape
    out = bytearray()
    for y in range(h):
        row = samples[y]
        if depth == 8:
            payload = row.astype(np.uint8).tobytes()
        elif depth == 16:
            payload = (row.astype(np.uint16) * 257).astype(">u2").tobytes()
        else:
            bits = ((row[:, None].astype(np.uint8) >>
                     np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
            payload = np.packbits(bits).tobytes()
        out += b"\x00" + payload
    return bytes(out)


def _write_png(img: np.ndarray, depth: int, ctype: int,
               interlace: int = 0, plte: np.ndarray | None = None) -> bytes:
    h, w = img.shape[:2]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    samples = img.reshape(h, w, ch)
    if interlace == 0:
        raw = _pack_rows(samples.reshape(h, w * ch), depth)
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(
                    _pack_rows(sub.reshape(sub.shape[0], -1), depth)
                )
        raw = b"".join(parts)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", ihdr)
    if plte is not None:
        out += png._chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += png._chunk(b"IDAT", zlib.compress(raw, 6))
    return out + png._chunk(b"IEND", b"")


# -- bit depths --------------------------------------------------------------


def test_1bit_gray_fax_style():
    img = (np.random.RandomState(0).rand(23, 37) > 0.5).astype(np.uint8)
    dec = png.decode(_write_png(img, 1, 0))
    assert np.array_equal(dec, img * 255)


@pytest.mark.parametrize("depth", [2, 4])
def test_sub_byte_gray(depth):
    maxv = (1 << depth) - 1
    img = (np.random.RandomState(depth).randint(0, maxv + 1, (19, 31))
           .astype(np.uint8))
    dec = png.decode(_write_png(img, depth, 0))
    assert np.array_equal(dec, img * (255 // maxv))


def test_4bit_palette():
    rng = np.random.RandomState(4)
    plte = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (17, 29)).astype(np.uint8)
    dec = png.decode(_write_png(idx, 4, 3, plte=plte))
    assert np.array_equal(dec, plte[idx])


def test_16bit_gray_high_byte():
    img = np.random.RandomState(16).randint(0, 256, (21, 33)).astype(np.uint8)
    dec = png.decode(_write_png(img, 16, 0))  # writer upsamples *257
    assert np.array_equal(dec, img)


def test_16bit_rgb():
    img = np.random.RandomState(6).randint(0, 256, (15, 22, 3)).astype(np.uint8)
    dec = png.decode(_write_png(img, 16, 2))
    assert np.array_equal(dec, img)


def test_16bit_palette_rejected():
    img = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="depth 16"):
        png.decode(_write_png(img, 16, 3, plte=np.zeros((2, 3), np.uint8)))


# -- Adam7 interlace ---------------------------------------------------------


@pytest.mark.parametrize("shape", [(24, 32), (23, 37), (7, 5), (1, 1), (9, 1)])
def test_adam7_gray_equals_sequential(shape):
    img = np.random.RandomState(7).randint(0, 256, shape).astype(np.uint8)
    seq = png.decode(_write_png(img, 8, 0, interlace=0))
    lace = png.decode(_write_png(img, 8, 0, interlace=1))
    assert np.array_equal(seq, lace)
    assert np.array_equal(lace, img)


def test_adam7_rgb_and_rgba():
    rng = np.random.RandomState(8)
    rgb = rng.randint(0, 256, (26, 19, 3)).astype(np.uint8)
    assert np.array_equal(png.decode(_write_png(rgb, 8, 2, interlace=1)), rgb)
    rgba = rng.randint(0, 256, (13, 21, 4)).astype(np.uint8)
    assert np.array_equal(png.decode(_write_png(rgba, 8, 6, interlace=1)), rgba)


def test_adam7_1bit_gray():
    img = (np.random.RandomState(9).rand(22, 30) > 0.5).astype(np.uint8)
    dec = png.decode(_write_png(img, 1, 0, interlace=1))
    assert np.array_equal(dec, img * 255)


def test_adam7_corpus_page_ocr_exact():
    """An interlaced re-encode of a real corpus page OCRs identically."""
    ref = "doc00000000/m0"
    gray = png.decode_gray(corpus.render_media_blob(ref))
    blob = _write_png(gray, 8, 0, interlace=1)
    truth = "\n".join(corpus.media_truth_text(ref))
    got, score = ocr.ocr_text(blob)
    assert got == truth and score > 0.8


def test_truncated_interlaced_absorbs():
    img = np.random.RandomState(3).randint(0, 256, (40, 40)).astype(np.uint8)
    blob = _write_png(img, 8, 0, interlace=1)
    assert ocr.ocr_text(blob[: len(blob) // 2]) == ("", 0.0)
