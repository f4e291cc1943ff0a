"""From-scratch CCITT Group 4 (ITU-T T.6, pure 2-D MMR) codec.

CCITTFaxDecode is THE classic bilevel scanned-document filter — fax-era
PDFs and most TIFF-derived scans use it — and the reference rasterizes
them transparently through pypdfium2 (/root/reference/src/
pdf_processing.py:21-73). This module implements the published T.4/T.6
coding scheme from the standard's description: per-line 2-D coding against
the reference line via pass / vertical(±3) / horizontal modes, with the
T.4 white/black terminating + make-up Huffman tables (and the shared
extended make-ups to 2560) for horizontal-mode run lengths.

Scope: all three /K regimes — K < 0 (pure Group 4, the form PDF writers
actually emit for scans), K = 0 (G3 pure 1-D MH, with or without EOL
markers, /EncodedByteAlign honored), and K > 0 (T.4 mixed 1-D/2-D with
per-line EOL + tag bits).

Verification: encoder/decoder round-trip on structured + random bitmaps
(pinned in tests/test_ccitt.py) plus structural table audits
(prefix-freeness per color, exact code counts) that catch transcription
errors a symmetric round-trip cannot. Cross-engine validation runs
automatically when pypdfium2 is importable (it is not in this container);
pypdfium2 remains the auto-probed first choice for rasterization.
"""

from __future__ import annotations

import numpy as np

# --- T.4 run-length code tables: {run: bitstring} ---------------------------

WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # make-ups
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
    # make-ups
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# shared extended make-ups (T.4 §2.4.1.2, both colors)
EXT_CODES = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# 2-D mode codes (T.6 table 1)
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}
EOFB = "000000000001" * 2


class CcittError(ValueError):
    pass


_MAXLEN = 14


def _decode_table(codes: dict[int, str], with_ext: bool = True):
    """{(code_length, code_value_as_int): run} — keyed so the decoder can
    probe prefixes of one _MAXLEN-bit integer peek, no string building."""
    t = {(len(code), int(code, 2)): run for run, code in codes.items()}
    if with_ext:
        t.update({(len(code), int(code, 2)): run
                  for run, code in EXT_CODES.items()})
    return t

_WHITE_DEC = _decode_table(WHITE_CODES)
_BLACK_DEC = _decode_table(BLACK_CODES)


class _BitReader:
    """O(1) integer bit reads over the byte stream (the string-peek
    version cost ~0.35 s per 1728-wide fax page; this one ~10x less).
    Bits past the end read as 0 — no valid T.4 code is all-zero, so
    overruns surface as bad-code/EOFB, never as silent data."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data + b"\0\0\0\0"  # zero tail pads peeks near the end
        self.pos = 0
        self.nbits = len(data) * 8

    def peek_int(self, n: int) -> int:
        """Next n bits (n <= 24) as an integer, zero-padded past the end."""
        byte0 = self.pos >> 3
        val = int.from_bytes(self.data[byte0 : byte0 + 4], "big")
        return (val >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.pos += n

    def exhausted(self) -> bool:
        return self.pos >= self.nbits


def _read_run(br: _BitReader, table) -> int:
    """One run length = zero or more make-up codes + one terminating code."""
    total = 0
    while True:
        window = br.peek_int(_MAXLEN)
        for ln in range(2, _MAXLEN + 1):
            run = table.get((ln, window >> (_MAXLEN - ln)))
            if run is not None:
                br.skip(ln)
                break
        else:
            raise CcittError(
                f"bad run code near bit {br.pos}: {window:0{_MAXLEN}b}"
            )
        total += run
        if run < 64:
            return total


def _read_mode(br: _BitReader):
    """Returns ('P',), ('H',), ('V', delta) or ('EOFB',). A 7-zero window
    can only be fill/EOL/EOFB/exhaustion (no 2-D mode code has 7 zeros)."""
    v = br.peek_int(7)
    if v >> 6:
        br.skip(1)
        return ("V", 0)
    t3 = v >> 4
    if t3 == 0b011:
        br.skip(3)
        return ("V", 1)
    if t3 == 0b010:
        br.skip(3)
        return ("V", -1)
    if t3 == 0b001:
        br.skip(3)
        return ("H",)
    if v >> 3 == 0b0001:
        br.skip(4)
        return ("P",)
    t6 = v >> 1
    if t6 == 0b000011:
        br.skip(6)
        return ("V", 2)
    if t6 == 0b000010:
        br.skip(6)
        return ("V", -2)
    if v == 0b0000011:
        br.skip(7)
        return ("V", 3)
    if v == 0b0000010:
        br.skip(7)
        return ("V", -3)
    return ("EOFB",)


def _b1_b2(ref: list[int], a0: int, color: int, columns: int):
    """b1 = first changing element on the reference line strictly right of
    a0 with color opposite the coding color; b2 = the next one after it.
    `ref` holds the reference line's changing positions (alternating: even
    index = white->black). Imaginary changes at `columns` close the line."""
    import bisect

    i = bisect.bisect_right(ref, a0)
    # transitions alternate white->black (even index) / black->white (odd):
    # coding color white needs a turn-to-black (even i), black needs odd
    if i % 2 != color:
        i += 1
    b1 = ref[i] if i < len(ref) else columns
    b2 = ref[i + 1] if i + 1 < len(ref) else columns
    return b1, b2


def _decode_2d_line(br: _BitReader, ref: list[int], columns: int,
                    y: int, rows: int) -> list[int]:
    """One 2-D-coded line -> its changing positions (alternating,
    starting with the turn-to-black)."""
    cur: list[int] = []
    a0, color = -1, 0
    while a0 < columns:
        mode = _read_mode(br)
        if mode[0] == "EOFB":
            # EOFB belongs strictly AFTER the last row; reading it (or
            # running out of bits) mid-image means missing data — a
            # silent white-fill here would be per-row data loss
            raise CcittError(
                f"premature EOFB/end of data at row {y + 1}/{rows}"
            )
        b1, b2 = _b1_b2(ref, a0, color, columns)
        if mode[0] == "P":
            a0 = b2
        elif mode[0] == "V":
            a1 = b1 + mode[1]
            if a1 < 0 or a1 > columns:
                raise CcittError(f"vertical move out of line at row {y}")
            cur.append(a1)
            a0, color = a1, 1 - color
        else:  # horizontal: two runs, color then opposite
            start = max(a0, 0)
            r1 = _read_run(br, _WHITE_DEC if color == 0 else _BLACK_DEC)
            r2 = _read_run(br, _BLACK_DEC if color == 0 else _WHITE_DEC)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > columns:
                raise CcittError(f"horizontal runs overflow row {y}")
            cur += [a1, a2]
            a0 = a2
        if len(cur) >= 2 and cur[-1] == cur[-2] == columns:
            break
    return cur


def _decode_1d_line(br: _BitReader, columns: int, y: int) -> list[int]:
    """One MH (1-D) line: alternating white/black run codes from line
    start, summing exactly to `columns`."""
    cur: list[int] = []
    pos, color = 0, 0
    while pos < columns:
        run = _read_run(br, _WHITE_DEC if color == 0 else _BLACK_DEC)
        pos += run
        if pos > columns:
            raise CcittError(f"1-D runs overflow row {y}")
        cur.append(pos)
        color = 1 - color
    return cur


def _paint_row(out: np.ndarray, y: int, cur: list[int], columns: int) -> None:
    px = [c for c in cur if c <= columns]
    for i in range(0, len(px) - 1 if len(px) % 2 else len(px), 2):
        end = px[i + 1] if i + 1 < len(px) else columns
        out[y, px[i]:end] = 1


def decode_g4(data: bytes, columns: int, rows: int) -> np.ndarray:
    """Group 4 (K < 0) bytes -> (rows, columns) uint8 array of 0/1 where
    1 = BLACK. G4 coding works in the white/black COLOR domain, so
    /BlackIs1 (which only renames sample values) never changes this
    function's output — callers map colors to gray directly."""
    br = _BitReader(data)
    out = np.zeros((rows, columns), dtype=np.uint8)
    ref: list[int] = []  # imaginary all-white reference line
    for y in range(rows):
        cur = _decode_2d_line(br, ref, columns, y, rows)
        _paint_row(out, y, cur, columns)
        ref = [c for c in cur if c < columns]
        if br.exhausted() and y < rows - 1:
            raise CcittError(f"stream exhausted at row {y + 1}/{rows}")
    return out


_EOL = "000000000001"


def _consume_eols(br: _BitReader) -> bool:
    """Skip fill zeros + EOL marker(s). No valid T.4 run/mode code has 9+
    leading zeros, so an 11-zero window can only be fill/EOL."""
    seen = False
    while not br.exhausted() and br.peek_int(11) == 0:
        while not br.exhausted() and br.peek_int(1) == 0:
            br.skip(1)
        if br.exhausted():
            return seen
        br.skip(1)  # the EOL's terminating 1
        seen = True
    return seen


def decode_g3(
    data: bytes, columns: int, rows: int, k: int = 0,
    byte_align: bool = False,
) -> np.ndarray:
    """Group 3 bytes -> (rows, columns) uint8, 1 = black.

    k = 0: pure 1-D MH lines (the /CCITTFaxDecode default). EOL markers
    and fill are consumed when present (PDF streams with /EndOfLine false
    omit them); byte_align honors /EncodedByteAlign (each line starts on
    a byte boundary).
    k > 0: mixed mode — every line is preceded by EOL + a 1-bit tag
    (1 = 1-D, 0 = 2-D against the previous line), per T.4 §4.2.1."""
    br = _BitReader(data)
    out = np.zeros((rows, columns), dtype=np.uint8)
    ref: list[int] = []
    for y in range(rows):
        if byte_align:
            br.pos = (br.pos + 7) // 8 * 8
        saw_eol = _consume_eols(br)
        if k > 0:
            if not saw_eol:
                # T.4 mixed mode carries the tag with each line's EOL; a
                # missing EOL means the stream is out of subset
                raise CcittError(f"missing EOL before mixed-mode row {y}")
            if br.exhausted():
                raise CcittError(f"stream exhausted at row {y}/{rows}")
            tag = br.peek_int(1)
            br.skip(1)
            if tag == 1:
                cur = _decode_1d_line(br, columns, y)
            else:
                cur = _decode_2d_line(br, ref, columns, y, rows)
        else:
            cur = _decode_1d_line(br, columns, y)
        _paint_row(out, y, cur, columns)
        ref = [c for c in cur if c < columns]
        if br.exhausted() and y < rows - 1:
            raise CcittError(f"stream exhausted at row {y + 1}/{rows}")
    return out


def _changes(row: np.ndarray) -> list[int]:
    """Changing positions of a 0/1 row (first pixel's change from the
    imaginary leading white)."""
    d = np.flatnonzero(np.diff(np.concatenate(([0], row.astype(np.int8)))))
    return d.tolist()


def _emit_run(bits: list[str], run: int, color: int) -> None:
    table = WHITE_CODES if color == 0 else BLACK_CODES
    while run >= 64:
        if run >= 2624:
            bits.append(EXT_CODES[2560])
            run -= 2560
            continue
        mk = min(run // 64 * 64, 2560)
        if mk > 1728:
            bits.append(EXT_CODES[mk])
        else:
            bits.append(table[mk])
        run -= mk
    bits.append(table[run])


def _encode_2d_line(out: list[str], cur: list[int], ref: list[int],
                    columns: int) -> None:
    import bisect

    a0, color = -1, 0
    while True:
        i = bisect.bisect_right(cur, a0)
        a1 = cur[i] if i < len(cur) else columns
        b1, b2 = _b1_b2(ref, a0, color, columns)
        if b2 < a1:
            out.append(_MODE_PASS)
            a0 = b2
        elif abs(a1 - b1) <= 3:
            out.append(_MODE_V[a1 - b1])
            a0, color = a1, 1 - color
            if a0 >= columns:
                return
        else:
            j = bisect.bisect_right(cur, a1)
            a2 = cur[j] if j < len(cur) else columns
            start = max(a0, 0)
            out.append(_MODE_HORIZ)
            _emit_run(out, a1 - start, color)
            _emit_run(out, a2 - a1, 1 - color)
            a0 = a2
            if a0 >= columns:
                return


def _encode_1d_line(out: list[str], cur: list[int], columns: int) -> None:
    prev, color = 0, 0
    for c in cur + [columns]:
        _emit_run(out, c - prev, color)
        prev, color = c, 1 - color


def _pack_bits(out: list[str]) -> bytes:
    s = "".join(out)
    s += "0" * (-len(s) % 8)
    return np.packbits(
        np.frombuffer(s.encode("ascii"), dtype=np.uint8) - ord("0")
    ).tobytes()


def encode_g4(bits_in: np.ndarray) -> bytes:
    """(rows, columns) 0/1 array (1 = black) -> Group 4 bytes + EOFB.
    The writer twin for self-verifying fixtures."""
    arr = (np.asarray(bits_in) != 0).astype(np.uint8)
    rows, columns = arr.shape
    out: list[str] = []
    ref: list[int] = []
    for _y in range(rows):
        cur = _changes(arr[_y])
        _encode_2d_line(out, cur, ref, columns)
        ref = cur
    out.append(EOFB)
    return _pack_bits(out)


def encode_g3(
    bits_in: np.ndarray, k: int = 0, eol: bool = True,
    byte_align: bool = False,
) -> bytes:
    """(rows, columns) 0/1 array (1 = black) -> Group 3 bytes.

    k = 0: pure MH 1-D lines, each preceded by EOL when eol=True (PDF
    /EndOfLine) and zero-padded to byte boundaries when byte_align=True
    (/EncodedByteAlign); k > 0: T.4 mixed mode — EOL + tag bit per line,
    a 1-D line every k-th row and 2-D lines between (EOLs mandatory)."""
    arr = (np.asarray(bits_in) != 0).astype(np.uint8)
    rows, columns = arr.shape
    out: list[str] = []
    ref: list[int] = []
    nbits = 0

    def emit(pieces: list[str]) -> None:
        nonlocal nbits
        out.extend(pieces)
        nbits += sum(len(p) for p in pieces)

    for y in range(rows):
        if byte_align and nbits % 8:
            emit(["0" * (8 - nbits % 8)])
        cur = _changes(arr[y])
        line: list[str] = []
        if k > 0:
            one_d = (y % k) == 0
            line.append(_EOL)
            line.append("1" if one_d else "0")
            if one_d:
                _encode_1d_line(line, cur, columns)
            else:
                _encode_2d_line(line, cur, ref, columns)
        else:
            if eol:
                line.append(_EOL)
            _encode_1d_line(line, cur, columns)
        emit(line)
        ref = cur
    return _pack_bits(out)
