"""Minimal PNG codec (8-bit depth, all standard color types) over stdlib
zlib + numpy.

The container has no PIL/cv2, so media blobs travel as PNG bytes encoded /
decoded here. Replaces the reference's cv2.imread / path-based IO
(/root/reference/src/image_processing.py:17-49, 76-134 — BGR color via cv2)
with pure in-memory byte<->ndarray conversion — the shape a BinaryType
column needs.

Decoder: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4
(gray+alpha), 6 (RGBA), no interlace; all five standard scanline filters
with the correct per-pixel byte stride. `decode_gray` reduces any of them
to the 2-D uint8 array the OCR kernel consumes (BT.601 integer luma).
Palette transparency (tRNS) is ignored — alpha never affects OCR ink.

Encoder: grayscale (filter 0) and RGB/RGBA (filter 0); used by the corpus
renderer and the color-input test fixtures.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _encode(img: np.ndarray, ctype: int, compress_level: int) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    flat = img.reshape(h, -1)
    raw = np.empty((h, flat.shape[1] + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter byte 0 per scanline
    raw[:, 1:] = flat
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_gray(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a 2-D uint8 array as a grayscale PNG."""
    if img.ndim != 2:
        raise ValueError(f"expected 2-D grayscale array, got shape {img.shape}")
    return _encode(img, 0, compress_level)


def encode_rgb(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode an (H, W, 3) RGB or (H, W, 4) RGBA uint8 array."""
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError(f"expected (H,W,3|4) array, got shape {img.shape}")
    return _encode(img, 2 if img.shape[2] == 3 else 6, compress_level)


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the PNG scanline filters. raw: (h, 1 + w*bpp) uint8 rows with
    the filter byte leading each row. Returns (h, w*bpp) uint8."""
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int32).copy()
    nbytes = w * bpp
    zero = np.zeros(nbytes, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        if f == 0:
            continue
        row = out[y]
        up = out[y - 1] if y > 0 else zero
        if f == 1:  # Sub
            for x in range(bpp, nbytes):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif f == 2:  # Up
            out[y] = (row + up) & 0xFF
        elif f == 3:  # Average
            for x in range(bpp):
                row[x] = (row[x] + up[x] // 2) & 0xFF
            for x in range(bpp, nbytes):
                row[x] = (row[x] + (row[x - bpp] + up[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(bpp):
                row[x] = (row[x] + up[x]) & 0xFF
            for x in range(bpp, nbytes):
                a, b, c = row[x - bpp], up[x], up[x - bpp]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return out.astype(np.uint8)


def decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG of any standard color type.

    Returns (H, W) for grayscale, (H, W, 3) for RGB and paletted, (H, W, 2)
    for gray+alpha, (H, W, 4) for RGBA."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ctype = None
    plte: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth} ctype={ctype} interlace={interlace})"
                )
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    bpp = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w * bpp + 1)
    flat = _unfilter(raw, h, w, bpp)
    if ctype == 0:
        return flat.reshape(h, w)
    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        return plte[flat.reshape(h, w)]
    return flat.reshape(h, w, bpp)


def to_gray(img: np.ndarray) -> np.ndarray:
    """Any decode() output -> 2-D uint8 via BT.601 integer luma
    ((299R + 587G + 114B + 500) // 1000); alpha channels are dropped —
    transparency never carries OCR ink."""
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray + alpha
        return np.ascontiguousarray(img[:, :, 0])
    rgb = img[:, :, :3].astype(np.int32)
    luma = (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2] + 500) // 1000
    return luma.astype(np.uint8)


def decode_gray(data: bytes) -> np.ndarray:
    """Decode any supported PNG into a 2-D uint8 grayscale array (the OCR
    kernel's input contract — color pages go through the luma transform)."""
    return to_gray(decode(data))
