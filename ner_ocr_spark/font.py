"""Deterministic 5x7 bitmap font: rendering + template tables.

Used on both sides of the OCR loop: the synthetic-corpus generator renders
ground-truth strings with it (FIXTURES.md §2), and the OCR kernel's glyph
classifier matches extracted glyphs against the same templates
(SURVEY.md §2.8 M1 — replaces the reference's PaddleOCR recognizer,
/root/reference/src/bounding_box.py:82-183, with a deterministic kernel).

Charset: A-Z 0-9 (uppercase-only; the corpus uppercases rendered text).
Glyphs are 5 wide x 7 tall; each row is a 5-bit int, bit 4 = leftmost.
"""

from __future__ import annotations

import numpy as np

GLYPH_W = 5
GLYPH_H = 7

_ROWS: dict[str, tuple[int, ...]] = {
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b11110),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b10101, 0b01010),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
}

CHARSET = sorted(_ROWS)


def glyph_bitmap(ch: str) -> np.ndarray:
    """(7,5) bool array for one character. Cached read-only: the renderer
    calls this once per character OCCURRENCE (round-6: rebuild per call was
    measurable in the corpus render path); callers only read/concatenate."""
    cached = _BITMAP_CACHE.get(ch)
    if cached is None:
        rows = _ROWS[ch]
        cached = np.zeros((GLYPH_H, GLYPH_W), dtype=bool)
        for y, bits in enumerate(rows):
            for x in range(GLYPH_W):
                cached[y, x] = bool((bits >> (GLYPH_W - 1 - x)) & 1)
        cached.setflags(write=False)
        _BITMAP_CACHE[ch] = cached
    return cached


_BITMAP_CACHE: dict[str, np.ndarray] = {}


def template_stack() -> tuple[np.ndarray, list[str]]:
    """All glyph templates as one (n_chars, 7, 5) bool array + charset list.

    The OCR classifier flattens this once per python worker and matches
    extracted glyphs by Hamming distance (vectorized matmul, no per-glyph
    loop over templates).
    """
    chars = CHARSET
    stack = np.stack([glyph_bitmap(c) for c in chars])
    return stack, chars


def render_lines(
    lines: list[str],
    scale: int = 2,
    margin: int = 6,
    char_gap: int = 2,
    space_gap: int = 4,
    line_gap: int = 5,
) -> np.ndarray:
    """Render text lines to a 2-D uint8 page image (white bg, black glyphs).

    Deterministic pure function — the ground-truth renderer of FIXTURES.md §2.
    Unknown characters render as blanks of glyph width (they segment as
    gaps). Returns 0/255 uint8.
    """
    rendered: list[np.ndarray] = []
    for line in lines:
        cols: list[np.ndarray] = []
        for ch in line.upper():
            if ch == " ":
                cols.append(np.zeros((GLYPH_H, space_gap), dtype=bool))
            elif ch in _ROWS:
                if cols:
                    cols.append(np.zeros((GLYPH_H, char_gap), dtype=bool))
                cols.append(glyph_bitmap(ch))
        bitmap = (
            np.concatenate(cols, axis=1) if cols else np.zeros((GLYPH_H, 1), dtype=bool)
        )
        rendered.append(bitmap)
    width = max(b.shape[1] for b in rendered)
    gap = np.zeros((line_gap, width), dtype=bool)
    padded: list[np.ndarray] = []
    for i, b in enumerate(rendered):
        if i:
            padded.append(gap)
        padded.append(
            np.pad(b, ((0, 0), (0, width - b.shape[1])))
        )
    page = np.concatenate(padded, axis=0)
    page = np.kron(page, np.ones((scale, scale), dtype=bool))
    page = np.pad(page, margin)
    return np.where(page, np.uint8(0), np.uint8(255))
