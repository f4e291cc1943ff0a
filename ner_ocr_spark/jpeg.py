"""Baseline JPEG codec (JFIF, sequential DCT, 8-bit) — stdlib + numpy.

The reference accepts .jpg/.jpeg inputs via cv2
(/root/reference/src/custom_types/enums.py:7-13, src/utils.py:90,
src/image_processing.py:17-49); this container has no image library, so
this module implements the baseline JPEG standard from scratch:

  decoder — SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS parsing, Huffman tables read
  FROM THE STREAM (not assumed), restart markers, 4:4:4 and 4:2:0 (any
  h,v in {1,2}) sampling, dequantize -> inverse zigzag -> IDCT (numpy
  matrix form) -> chroma upsample -> YCbCr->RGB.

  encoder — grayscale or RGB 4:4:4 with the Annex K quantization tables
  (libjpeg quality scaling) and Annex K Huffman tables; used by test
  fixtures and available as a sink codec.

Pure python Huffman bit IO is the known slow path: at 100 TB this decode
belongs behind the pluggable blob/codec hook (operators/extract
blob_resolver) where a native library replaces it executor-side; the
format support and the pipeline plumbing are what this module makes real.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants ---------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# ITU-T T.81 Annex K.1/K.2 quantization tables (zigzag-free, row order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 8x8 DCT basis: C[u, x] = a(u) * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(1 / 8) if _u == 0 else 0.5
        )


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _canonical_codes(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL -> {symbol: (code, length)} (canonical assignment)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL -> {(length, code): symbol} for the bit reader."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# -- encoder -----------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(w: _BitWriter, block: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    zz = block.flatten()[ZIGZAG]
    dc = int(zz[0])
    t, bits = _magnitude(dc - pred)
    code, length = dc_codes[t]
    w.write(code, length)
    if t:
        w.write(bits, t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 1) if len(last_nz) else 0
    for i in range(1, end + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        t, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | t]
        w.write(code, length)
        w.write(bits, t)
        run = 0
    if end < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def _dht_segment(tclass: int, tid: int, spec) -> bytes:
    bits, vals = spec
    payload = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(payload) + 2) + payload


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    zz = table.flatten()[ZIGZAG].astype(np.uint8)
    payload = bytes([tid]) + zz.tobytes()
    return b"\xff\xdb" + struct.pack(">H", len(payload) + 2) + payload


def _pad_to(p: np.ndarray, hh: int, ww: int) -> np.ndarray:
    pp = np.empty((hh, ww))
    h, w = p.shape
    pp[:h, :w] = p
    if hh > h:
        pp[h:, :w] = p[h - 1 :, :]  # edge replicate
    if ww > w:
        pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode(img: np.ndarray, quality: int = 90, subsampling: str = "444") -> bytes:
    """Encode (H,W) grayscale or (H,W,3) RGB uint8 as baseline JFIF
    (Annex K tables scaled by libjpeg-style quality). subsampling: '444'
    (every component full-resolution) or '420' (chroma halved both ways —
    the common camera/web layout; exercises the decoder's MCU sampling)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError(f"expected (H,W) or (H,W,3), got {img.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = img.shape[:2]
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    sub = 2 if (subsampling == "420" and not gray) else 1

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        quants, samps = [ql], [(1, 1)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub == 2:
            # mean-pool 2x2 (pad odd dims by edge replicate first)
            ch, cw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cb = _pad_to(cb, ch, cw).reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
            cr = _pad_to(cr, ch, cw).reshape(ch // 2, 2, cw // 2, 2).mean(axis=(1, 3))
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        quants = [ql, qc, qc]
        samps = [(sub, sub), (1, 1), (1, 1)]

    dc_l = _canonical_codes(*DC_LUMA_SPEC)
    ac_l = _canonical_codes(*AC_LUMA_SPEC)
    dc_c = _canonical_codes(*DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*AC_CHROMA_SPEC)

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_to(p, mcuy * samps[i][1] * 8, mcux * samps[i][0] * 8)
        for i, p in enumerate(planes)
    ]

    writer = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, p in enumerate(padded):
                ch, cv = samps[ci]
                for v in range(cv):
                    for hh in range(ch):
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8]
                        coef = np.round(_fdct(block) / quants[ci]).astype(np.int64)
                        preds[ci] = _encode_block(
                            writer, coef, preds[ci],
                            dc_l if ci == 0 else dc_c,
                            ac_l if ci == 0 else ac_c,
                        )
    writer.flush()

    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sos_comp = b""
    for ci in range(ncomp):
        hv = (samps[ci][0] << 4) | samps[ci][1]
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
        sos_comp += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
            + struct.pack(">HHBB", 1, 1, 0, 0))
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_SPEC)
    out += _dht_segment(1, 0, AC_LUMA_SPEC)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_SPEC)
        out += _dht_segment(1, 1, AC_CHROMA_SPEC)
    sos = bytes([ncomp]) + sos_comp + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -- decoder -----------------------------------------------------------------

class _BitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise EOFError("truncated entropy segment")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_after_restart(self) -> None:
        """Skip the RST marker and byte-align."""
        self.acc = 0
        self.n = 0
        self.pos += 2  # consume FF Dn


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


def decode(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF byte string. Returns (H,W) uint8 for
    single-component images, (H,W,3) RGB uint8 otherwise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0xFF:  # T.81 B.1.1.2: 0xFF fill bytes before a marker
            pos += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            # standalone markers carry no length word — a stray SOI (0xD8)
            # in a corrupt header must not be read as length-prefixed or
            # the scan desyncs and reports garbage (round-2 ADVICE)
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if seglen < 2:
            raise ValueError(
                f"corrupt JPEG header: segment FF{marker:02X} declares "
                f"length {seglen} < 2"
            )
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int32)
                t = np.zeros(64, dtype=np.int32)
                t[ZIGZAG] = zz
                qtables[tid] = t.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tclass, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                htables[(tclass, tid)] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline / ext sequential)
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if ns < len(comps):
                raise ValueError(
                    "non-interleaved multi-scan JPEG unsupported (one SOS "
                    f"covers {ns} of {len(comps)} components)"
                )
            scan = []
            for c in range(ns):
                cs, tds = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                comp["td"], comp["ta"] = tds >> 4, tds & 0xF
                scan.append(comp)
            if ns == 1:
                # T.81 A.2: a single-component scan is NON-interleaved —
                # MCU = one data unit, sampling factors unused (a gray
                # JPEG may legally declare hv=0x22 in SOF)
                scan[0] = {**scan[0], "h": 1, "v": 1}
            pos = pos + 2 + seglen
            return _decode_scan(data, pos, w, h, scan, qtables, htables,
                                restart_interval)
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, w, h, comps, qtables, htables, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    preds = [0] * len(comps)
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # expect an RST marker; reader raises when it hits it
                try:
                    while True:
                        reader.bit()
                except _RestartMarker:
                    reader.align_after_restart()
                    preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                q = qtables[c["tq"]]
                dct = htables[(0, c["td"])]
                act = htables[(1, c["ta"])]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        t = _huff_decode(reader, dct)
                        diff = _extend(reader.bits(t), t) if t else 0
                        preds[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _extend(reader.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = _idct(coef.reshape(8, 8) * q)
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.kron(p, np.ones((ry, rx)))
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
