"""Deterministic synthetic corpus (FIXTURES.md §§1-3,5).

Every row is a pure function of (seed, doc_id) — hashlib-based seeding, never
Python's builtin hash (PYTHONHASHSEED-dependent). Generates:

  * `documents(doc_id, spans array<struct<kind,text,media_ref,offset>>)` —
    the BASELINE.json input_hint shape; interleaved text + media spans.
  * media blobs: glyph-grid PNGs (rotation ±5 deg, salt noise, seeded
    contrast) keyed by media_ref — synthesized on demand, so executors can
    materialize them distributed (pure function of media_ref).
  * gazetteer: entity surface forms guaranteed to appear in generated text.

The reference analog is a directory of PDFs/images
(/root/reference/src/utils.py:89-106); here the unit of work is a document
row whose media spans point at synthesizable page images.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from ner_ocr_spark import font
from ner_ocr_spark.png import encode_gray

WORDS = (
    "THE QUICK BROWN FOX JUMPS OVER LAZY DOG RIVER STONE CLOUD LIGHT "
    "PAPER TABLE GREEN NORTH SOUTH HOUSE PLANT METAL GLASS TRAIN"
).split()

# gazetteer: (surface, entity_type) — mirrors the reference entity registry
# (/root/reference/src/entities.py:9-49, /root/reference/entities.yaml)
GAZETTEER: list[tuple[str, str]] = [
    ("ALICE COOPER", "PERSON"),
    ("BOB STONE", "PERSON"),
    ("CAROL RIVERA", "PERSON"),
    ("DAVID HUME", "PERSON"),
    ("LONDON", "CITY"),
    ("PARIS", "CITY"),
    ("BERLIN", "CITY"),
    ("MADRID", "CITY"),
    ("BAKER STREET 221B", "ADDRESS"),
    ("MAIN STREET 42", "ADDRESS"),
    ("HIGH ROAD 7", "ADDRESS"),
    ("UCL HOSPITAL", "ORG"),
    ("ACME CORP", "ORG"),
]

# boilerplate segments the normalizer must strip (main-content extraction,
# BASELINE.json north_rule)
BOILERPLATE = [
    "COOKIE POLICY ACCEPT ALL",
    "SUBSCRIBE TO OUR NEWSLETTER",
    "ALL RIGHTS RESERVED FOOTER",
    "CLICK HERE TO LOG IN",
]


def _rng(*parts: object) -> np.random.RandomState:
    h = hashlib.sha256("|".join(str(p) for p in parts).encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "big"))


def doc_id_for(idx: int) -> str:
    return f"doc{idx:08d}"


def _sentence(rng: np.random.RandomState) -> str:
    n = int(rng.randint(3, 8))
    toks = [WORDS[i] for i in rng.randint(0, len(WORDS), n)]
    r = rng.rand()
    if r < 0.35:  # inject a gazetteer entity
        surface, _ = GAZETTEER[int(rng.randint(0, len(GAZETTEER)))]
        pos = int(rng.randint(0, len(toks) + 1))
        toks.insert(pos, surface)
    return " ".join(toks)


def media_truth_text(media_ref: str) -> list[str]:
    """Ground-truth lines rendered into the blob for `media_ref`."""
    rng = _rng("media", media_ref)
    n_lines = int(rng.randint(1, 4))
    return [_sentence(rng) for _ in range(n_lines)]


def _rotate_gray(img: np.ndarray, angle_deg: float, bg: int) -> np.ndarray:
    if abs(angle_deg) < 1e-9:
        return img
    h, w = img.shape
    r = math.radians(angle_deg)
    c, s = math.cos(r), math.sin(r)
    nh = int(abs(h * c) + abs(w * s) + 1)
    nw = int(abs(w * c) + abs(h * s) + 1)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ncy, ncx = (nh - 1) / 2.0, (nw - 1) / 2.0
    dy = (np.arange(nh, dtype=np.float32) - ncy)
    dx = (np.arange(nw, dtype=np.float32) - ncx)
    sy = np.round((c * dy + cy)[:, None] + (s * dx)[None, :]).astype(np.int32)
    sx = np.round((-s * dy + cx)[:, None] + (c * dx)[None, :]).astype(np.int32)
    valid = (sy >= 0) & (sy < h) & (sx >= 0) & (sx < w)
    # clamp + flat gather + where: identical values to the boolean-masked
    # scatter form, without the two extra boolean fancy-index passes
    np.clip(sy, 0, h - 1, out=sy)
    np.clip(sx, 0, w - 1, out=sx)
    sy *= w
    sy += sx
    return np.where(valid, img.ravel().take(sy), np.uint8(bg))


def render_media_blob(media_ref: str, oversize: bool = False) -> bytes:
    """PNG bytes for a media_ref — pure function of the key (FIXTURES.md §2).

    Seeded rotation (deskew target), sparse salt noise (despeckle target),
    seeded ink/bg contrast (Otsu target). `oversize` renders at a scale that
    exceeds the 1500 px bound to exercise bounded_resize (the corpus keeps
    the oversize scale an even multiple so block-mean downsampling is exact).
    """
    rng = _rng("blob", media_ref)
    lines = media_truth_text(media_ref)
    scale = 9 if oversize else 4
    margin = 360 if oversize else 12
    page = font.render_lines(lines, scale=scale, margin=margin)
    ink = int(rng.randint(20, 70))
    bg = int(rng.randint(180, 235))
    gray = np.where(page == 0, np.uint8(ink), np.uint8(bg))
    angle = float(rng.uniform(-5.0, 5.0))
    gray = _rotate_gray(gray, angle, bg)
    # sparse pepper noise on background (isolated -> despeckled away)
    n_noise = int(gray.size * 0.0004)
    if n_noise:
        ys = rng.randint(0, gray.shape[0], n_noise)
        xs = rng.randint(0, gray.shape[1], n_noise)
        keep = gray[ys, xs] == bg
        gray[ys[keep], xs[keep]] = np.uint8(ink)
    # level 1: every consumer decodes the pixels (never fingerprints the
    # bytes), and the blob is synthesized executor-side per task — cheap
    # deflate halves the render path's zlib share (round-6)
    return encode_gray(gray, compress_level=1)


def doc_spans(doc_id: str, p_media: float = 0.3, heavy: bool = False) -> list[dict]:
    """Ordered span list for one document (input_hint schema).

    heavy docs get 40-80 media spans (skew-test knob, FIXTURES.md §1;
    SURVEY.md §5.2.5 scales this up in the dedicated skew test).
    """
    rng = _rng("doc", doc_id)
    if heavy:
        n = int(rng.randint(40, 81))
    else:
        n = min(1 + int(rng.geometric(0.18)), 24)
    spans: list[dict] = []
    offset = 0
    media_j = 0
    for i in range(n):
        is_media = bool(rng.rand() < (0.9 if heavy else p_media))
        if is_media:
            ref = f"{doc_id}/m{media_j}"
            media_j += 1
            spans.append(
                {"kind": "media", "text": None, "media_ref": ref, "offset": offset}
            )
            offset += 64
        else:
            sent = _sentence(rng)
            if rng.rand() < 0.25:  # boilerplate to strip
                bp = BOILERPLATE[int(rng.randint(0, len(BOILERPLATE)))]
                sent = f"{sent} [[{bp}]]"
            if rng.rand() < 0.15:  # leading/trailing junk whitespace
                sent = f"  {sent}  "
            spans.append(
                {"kind": "text", "text": sent, "media_ref": None, "offset": offset}
            )
            offset += len(sent) + 1
    return spans


def build_documents(n_docs: int, heavy_frac: float = 0.0) -> list[dict]:
    """Driver-side corpus for tests: list of {doc_id, spans} rows."""
    rows = []
    for i in range(n_docs):
        doc_id = doc_id_for(i)
        heavy = heavy_frac > 0 and (_rng("heavy", doc_id).rand() < heavy_frac)
        rows.append({"doc_id": doc_id, "spans": doc_spans(doc_id, heavy=heavy)})
    return rows
