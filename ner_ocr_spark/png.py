"""Minimal PNG codec (8-bit grayscale) over stdlib zlib + numpy.

The container has no PIL/cv2, so media blobs travel as PNG bytes encoded /
decoded here. Replaces the reference's cv2.imread / path-based IO
(/root/reference/src/image_processing.py:76-134) with pure in-memory
byte<->ndarray conversion — the shape a BinaryType column needs.

Supports: color type 0 (grayscale), bit depth 8, no interlace. The decoder
implements all five standard scanline filters so any conforming gray-8 PNG
round-trips; the encoder always emits filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a 2-D uint8 array as a grayscale PNG."""
    if img.ndim != 2:
        raise ValueError(f"expected 2-D grayscale array, got shape {img.shape}")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_gray(data: bytes) -> np.ndarray:
    """Decode a grayscale (color type 0, depth 8) PNG into a 2-D uint8 array."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError(f"unsupported PNG (depth={depth} ctype={ctype} interlace={interlace})")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    raw = raw.reshape(h, w + 1)
    filters = raw[:, 0]
    out = raw[:, 1:].astype(np.int32).copy()
    for y in range(h):
        f = filters[y]
        if f == 0:
            continue
        row = out[y]
        up = out[y - 1] if y > 0 else np.zeros(w, dtype=np.int32)
        if f == 1:  # Sub
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif f == 2:  # Up
            out[y] = (row + up) & 0xFF
        elif f == 3:  # Average
            row[0] = (row[0] + up[0] // 2) & 0xFF
            for x in range(1, w):
                row[x] = (row[x] + (row[x - 1] + up[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            row[0] = (row[0] + up[0]) & 0xFF
            for x in range(1, w):
                a, b, c = row[x - 1], up[x], up[x - 1]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
    return out.astype(np.uint8)
