"""Format-sniffing image decode: PNG (all depths/color types, Adam7) or
JPEG (baseline + progressive) from raw bytes.

The media-blob contract everywhere in the engine is "bytes in a BinaryType
column"; this module picks the codec from the magic bytes — mirroring the
reference's extension dispatch (/root/reference/src/utils.py:85-96 routes
.png/.jpg/.jpeg into cv2.imread) without trusting filenames."""

from __future__ import annotations

import numpy as np

from ner_ocr_spark import jpeg, png

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8"


def sniff(data: bytes) -> str:
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == JPEG_SIG:
        return "jpeg"
    return "unknown"


def decode_image(data: bytes) -> np.ndarray:
    """bytes -> (H,W) gray or (H,W,C) color uint8 array."""
    kind = sniff(bytes(data))
    if kind == "png":
        return png.decode(bytes(data))
    if kind == "jpeg":
        return jpeg.decode(bytes(data))
    raise ValueError("unsupported image format (not PNG or JPEG)")


def decode_image_gray(data: bytes) -> np.ndarray:
    """bytes -> 2-D uint8 grayscale (the OCR kernel's input contract)."""
    return png.to_gray(decode_image(data))
