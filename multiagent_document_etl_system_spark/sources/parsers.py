"""Format-dispatch document parsing (SURVEY.md §2.1, S1–S5).

The reference routes a file to a parser by extension — pdfplumber /
python-docx / pytesseract OCR / UTF-8 fallback
(/root/reference/src/parsers.py:4-105). Spark-first restatement:

- scan a landing directory with ``binaryFile`` (path, content) — io.py;
- dispatch on extension with ``F.when`` (S1);
- per-format parsing as **Arrow-batched Pandas UDFs over the binary
  content** — the parse libraries (pdfplumber, python-docx, pytesseract)
  are NOT in this container, so each UDF degrades per-row to an error
  string (never a task failure — the pipeline's per-row fault tolerance,
  SURVEY.md §2.7 D5); plain text (S5) parses for real.

Unit tests exercise the dispatch + the text path with synthetic bytes
(tests/test_sources.py); parse UDFs never sit in the oracle path
(SURVEY.md §7.4).

Scale: parsing is a narrow map over (path, content) — partition count
follows file count; ``spark.sql.files.maxPartitionBytes`` balances batch
size; per-executor library state lives in the UDF closure (lazy import
singleton), the standard pattern for heavyweight per-partition init.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARSE_RESULT = T.StructType([
    T.StructField("raw_text", T.StringType()),
    T.StructField("parse_error", T.StringType()),
])

# S1 extension routing (/root/reference/src/parsers.py:14-29)
PDF_EXTS = (".pdf",)
DOCX_EXTS = (".docx", ".doc")
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".tiff")


def file_format(path: Column) -> Column:
    """S1 — extension dispatch column: pdf | docx | image | text."""
    lower = F.lower(path)
    fmt = F.lit("text")
    for exts, label in ((PDF_EXTS, "pdf"), (DOCX_EXTS, "docx"),
                        (IMAGE_EXTS, "image")):
        cond = None
        for e in exts:
            c = lower.endswith(e)
            cond = c if cond is None else (cond | c)
        fmt = F.when(cond, F.lit(label)).otherwise(fmt)
    return fmt


def _mk_parser(importer: Callable[[], object], parse_fn, label: str):
    """Build a (bytes → (text, error)) row parser with a lazy per-executor
    library import — errors become row values, never task failures."""

    state: dict[str, object] = {}

    def parse_bytes(b) -> tuple[str | None, str | None]:
        if b is None:
            return None, f"{label} parse failed: empty content"
        if "lib" not in state:
            try:
                state["lib"] = importer()
            except ImportError as exc:
                state["lib"] = None
                state["err"] = f"{label} library unavailable: {exc}"
        lib = state.get("lib")
        if lib is None:
            return None, str(state.get("err"))
        try:
            return parse_fn(lib, bytes(b)), None
        except Exception as exc:  # noqa: BLE001 — per-row fault tolerance
            return None, f"{label} parse failed: {exc}"

    return parse_bytes


def _pdf_parse(lib, b: bytes) -> str:
    # pdfplumber page-concat semantics (/root/reference/src/parsers.py:35-50)
    import io
    with lib.open(io.BytesIO(b)) as pdf:
        return "\n".join((page.extract_text() or "") for page in pdf.pages)


_PDF_TEXT_OP = None  # lazily compiled regexes (executor-side)


def _pdf_parse_stdlib(b: bytes) -> str:
    """Pure-stdlib PDF text extraction for the common simple subset:
    content streams (raw or FlateDecode/zlib — stdlib) scanned for the
    text-showing operators ``(…) Tj`` / ``[(…)…] TJ`` inside BT/ET blocks,
    with PDF string escapes (\\\\ \\( \\) \\n octal) decoded. No layout
    analysis — shown strings join in stream order, one line per text op,
    matching pdfplumber's reading order on simple generated documents
    (/root/reference/src/parsers.py:35-50). Encrypted, CID-font, or
    object-stream PDFs fall out as a parse_error via the caller's per-row
    error channel — the honest subset boundary."""
    import re
    import zlib

    global _PDF_TEXT_OP
    if _PDF_TEXT_OP is None:
        _PDF_TEXT_OP = (
            re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj"
                       rb"|\[((?:[^\]\\]|\\.)*)\]\s*TJ", re.S),
            re.compile(rb"\(((?:[^()\\]|\\.)*)\)"),
            re.compile(rb"stream\r?\n(.*?)endstream", re.S),
        )
    op_re, str_re, stream_re = _PDF_TEXT_OP

    if not b.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")

    def unescape(s: bytes) -> str:
        out = bytearray()
        i = 0
        while i < len(s):
            c = s[i]
            if c == 0x5C and i + 1 < len(s):  # backslash
                n = s[i + 1]
                i += 2
                if n in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8,
                                0x66: 12}[n])
                elif 0x30 <= n <= 0x37:  # octal, up to 3 digits
                    oct_digits = chr(n)
                    while (i < len(s) and len(oct_digits) < 3
                           and 0x30 <= s[i] <= 0x37):
                        oct_digits += chr(s[i])
                        i += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                else:
                    out.append(n)
            else:
                out.append(c)
                i += 1
        return out.decode("latin-1")

    lines: list[str] = []
    for m in stream_re.finditer(b):
        data = m.group(1)
        try:
            data = zlib.decompress(data)
        except zlib.error:
            pass  # raw (uncompressed) content stream
        for op in op_re.finditer(data):
            if op.group(1) is not None:          # (…) Tj
                lines.append(unescape(op.group(1)))
            else:                                # [(…) kern (…)] TJ
                parts = [unescape(sm.group(1))
                         for sm in str_re.finditer(op.group(2))]
                lines.append("".join(parts))
    if not lines:
        raise ValueError("no extractable text operators found")
    return "\n".join(lines)


def make_demo_pdf_bytes(lines: list[str], compress: bool = True) -> bytes:
    """A minimal valid single-page PDF (stdlib only) with one text line per
    Tj operator; ``compress=True`` Flate-encodes the content stream the way
    real generators do."""
    import zlib

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    content = b"BT /F1 12 Tf 72 720 Td 14 TL\n" + b"\n".join(
        f"({esc(ln)}) Tj T*".encode("latin-1") for ln in lines) + b"\nET"
    flt = b""
    if compress:
        content = zlib.compress(content)
        flt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(content)).encode() + flt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def _docx_parse(lib, b: bytes) -> str:
    # python-docx paragraphs + tables rows joined ' | '
    # (/root/reference/src/parsers.py:53-86)
    import io
    doc = lib.Document(io.BytesIO(b))
    chunks = [p.text for p in doc.paragraphs if p.text.strip()]
    for table in doc.tables:
        for row in table.rows:
            cells = [c.text.strip() for c in row.cells if c.text.strip()]
            if cells:
                chunks.append(" | ".join(cells))
    return "\n".join(chunks)


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def _docx_parse_stdlib(b: bytes) -> str:
    """Pure-stdlib DOCX text extraction — a .docx is a zip whose body lives
    in word/document.xml. Reproduces the reference's python-docx semantics
    (/root/reference/src/parsers.py:53-86): body-level non-empty paragraphs
    first, then each table row flattened with non-empty cells joined
    ``' | '``, all chunks joined with newlines. This makes DOCX the one
    non-trivial format that parses end-to-end even without python-docx in
    the environment (the library path above is preferred when present)."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(b)) as z:
        root = ET.fromstring(z.read("word/document.xml"))
    body = root.find(_W_NS + "body")
    if body is None:
        return ""

    def para_text(p) -> str:
        return "".join(t.text or "" for t in p.iter(_W_NS + "t"))

    chunks: list[str] = []
    tables = []
    for child in body:
        if child.tag == _W_NS + "p":
            txt = para_text(child)
            if txt.strip():
                chunks.append(txt)
        elif child.tag == _W_NS + "tbl":
            tables.append(child)
    for tbl in tables:
        for tr in tbl.iter(_W_NS + "tr"):
            cells = []
            for tc in tr.findall(_W_NS + "tc"):
                # python-docx cell.text: paragraph texts joined with \n
                ctext = "\n".join(
                    para_text(p) for p in tc.findall(_W_NS + "p")).strip()
                if ctext:
                    cells.append(ctext)
            if cells:
                chunks.append(" | ".join(cells))
    return "\n".join(chunks)


def make_demo_docx_bytes(paragraphs: list[str],
                         table_rows: list[list[str]] | None = None) -> bytes:
    """A minimal valid .docx (zip + document.xml) built with the stdlib —
    test/demo fixture so the docx path can parse for real in environments
    without binary fixtures."""
    import io
    import zipfile
    from xml.sax.saxutils import escape

    parts = []
    for p in paragraphs:
        parts.append(f"<w:p><w:r><w:t>{escape(p)}</w:t></w:r></w:p>")
    for row in (table_rows or []):
        cells = "".join(
            f"<w:tc><w:p><w:r><w:t>{escape(c)}</w:t></w:r></w:p></w:tc>"
            for c in row
        )
        parts.append(f"<w:tbl><w:tr>{cells}</w:tr></w:tbl>")
    doc_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(parts) + "</w:body></w:document>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/><Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
        'document.main+xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("word/document.xml", doc_xml)
    return buf.getvalue()


def _image_parse(lib, b: bytes) -> str:
    # pytesseract full-page OCR (/root/reference/src/parsers.py:90-105)
    import io

    from PIL import Image
    return lib.image_to_string(Image.open(io.BytesIO(b)))



# --- S4 stdlib OCR rung -----------------------------------------------------
#
# The reference OCRs scanned pages with pytesseract
# (/root/reference/src/parsers.py:90-105). Tesseract is not in this
# container, so until r4 image rows degraded to a per-row error. The stdlib
# rung below is REAL (small) OCR for the machine-rendered case: decode an
# uncompressed 24-bit BMP with struct, binarize, segment lines/characters by
# blank rows/columns, and nearest-template-match each cell against a 5x7
# glyph font (Hamming distance with tolerance, '?' when nothing is close).
# That covers screenshots/renders of text in a known font — the same
# "constrained but genuine subset" contract as the pure-stdlib PDF and DOCX
# rungs; photographs and arbitrary fonts still require the real engine.
# ``render_text_bmp`` is the matching renderer (used by tests, which also
# add noise pixels to prove the tolerance is doing work).

_FONT_5X7: dict[str, tuple[int, ...]] = {
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
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
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

_GLYPH_W, _GLYPH_H = 5, 7
#: worst acceptable Hamming distance for a match (of 35 cells); above it
#: the cell reads as '?' rather than guessing
_OCR_MAX_HAMMING = 8


def _trim_resample(bits: list[list[bool]]) -> list[list[bool]]:
    """Bounding-box trim + nearest-neighbor resample to the 5x7 grid —
    the shared normalization for scanned cells AND font templates, so a
    narrow glyph ('I', '1') whose blank flanks the column segmenter strips
    still lands on the same grid as its template."""
    rs = [r for r, row in enumerate(bits) if any(row)]
    cs = [c for c in range(len(bits[0])) if any(row[c] for row in bits)]
    if not rs or not cs:
        return [[False] * _GLYPH_W for _ in range(_GLYPH_H)]
    r0, r1, c0, c1 = rs[0], rs[-1] + 1, cs[0], cs[-1] + 1
    ch, cw = r1 - r0, c1 - c0
    return [
        [bits[r0 + min(ch - 1, r * ch // _GLYPH_H)]
             [c0 + min(cw - 1, c * cw // _GLYPH_W)]
         for c in range(_GLYPH_W)]
        for r in range(_GLYPH_H)
    ]


def _glyph_templates() -> dict[str, list[list[bool]]]:
    out = {}
    for name, rows in _FONT_5X7.items():
        bits = [[bool(rows[r] >> (_GLYPH_W - 1 - c) & 1)
                 for c in range(_GLYPH_W)] for r in range(_GLYPH_H)]
        out[name] = _trim_resample(bits)
    return out


_TEMPLATES = _glyph_templates()


def _render_text_pixels(text: str, margin: int = 2) -> list[list[int]]:
    """A-Z/0-9/space text → top-down luminance raster (white canvas,
    black 5x7 glyphs) — shared by the BMP and PNG renderer twins."""
    lines = [ln.upper() for ln in text.split("\n")]
    n_cols = max((len(ln) for ln in lines), default=0)
    w = margin * 2 + max(n_cols * (_GLYPH_W + 1) - 1, 1)
    h = margin * 2 + len(lines) * (_GLYPH_H + 1) - 1
    px = [[255] * w for _ in range(h)]
    for li, ln in enumerate(lines):
        y0 = margin + li * (_GLYPH_H + 1)
        for ci, ch in enumerate(ln):
            rows = _FONT_5X7.get(ch)
            if rows is None:
                continue  # space and unknowns stay blank
            x0 = margin + ci * (_GLYPH_W + 1)
            for r, bits in enumerate(rows):
                for c in range(_GLYPH_W):
                    if bits >> (_GLYPH_W - 1 - c) & 1:
                        px[y0 + r][x0 + c] = 0
    return px


def render_text_bmp(text: str, margin: int = 2) -> bytes:
    """Render A-Z/0-9/space text (newlines = line breaks) as an
    uncompressed 24-bit BMP — the deterministic twin of the OCR rung."""
    import struct

    px = _render_text_pixels(text, margin)
    h, w = len(px), len(px[0])
    row_pad = (-(w * 3)) % 4
    body = bytearray()
    for row in reversed(px):  # BMP is bottom-up
        for v in row:
            body += bytes((v, v, v))
        body += b"\x00" * row_pad
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return bytes(hdr + dib + body)


def render_text_png(text: str, margin: int = 2) -> bytes:
    """Render text as an 8-bit grayscale zlib-compressed PNG (filter 0)
    — the deterministic twin of the PNG OCR rung."""
    import struct
    import zlib

    px = _render_text_pixels(text, margin)
    h, w = len(px), len(px[0])

    def chunk(typ: bytes, data: bytes) -> bytes:
        raw = typ + data
        return struct.pack(">I", len(data)) + raw \
            + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, no interlace
    raw = b"".join(b"\x00" + bytes(row) for row in px)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _decode_bmp_24(b: bytes) -> list[list[int]]:
    """Uncompressed 24-bit BMP -> top-down luminance rows (0-255)."""
    import struct

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP file")
    (_, _, _, _, offset) = struct.unpack_from("<2sIHHI", b, 0)
    (hsz, w, h, _, bpp, comp) = struct.unpack_from("<IiiHHI", b, 14)[:6]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for r in range(h):
        src = r * stride + offset
        row = [
            (b[src + 3 * c] + b[src + 3 * c + 1] + b[src + 3 * c + 2]) // 3
            for c in range(w)
        ]
        rows.append(row)
    return rows[::-1] if bottom_up else rows


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(b: bytes) -> list[list[int]]:
    """8-bit non-interlaced PNG (gray / gray+alpha / RGB / RGBA / palette)
    → top-down luminance rows, pure stdlib: chunk walk + zlib inflate +
    full filter reconstruction (None/Sub/Up/Average/Paeth per the PNG
    spec §9). Covers what screenshot and render tools actually emit; 16-bit
    and interlaced files raise and degrade per-row honestly."""
    import struct
    import zlib

    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG file")
    pos, idat, palette = len(_PNG_SIG), bytearray(), None
    w = h = ctype = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # chunk header + payload + CRC
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or comp != 0 or filt != 0 or ilace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, interlace={ilace})")
            if ctype not in (0, 2, 3, 4, 6):
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif typ == b"PLTE":
            palette = [data[i:i + 3] for i in range(0, len(data), 3)]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * nch
    rows: list[list[int]] = []
    prev = bytearray(stride)
    off = 0
    for _ in range(h):
        ft = raw[off]
        off += 1
        cur = bytearray(raw[off:off + stride])
        off += stride
        if ft == 1:  # Sub
            for i in range(nch, stride):
                cur[i] = (cur[i] + cur[i - nch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                cur[i] = (cur[i] + (a + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                up = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (up if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        prev = cur
        if ctype == 0:
            lum = list(cur)
        elif ctype == 4:
            lum = [cur[i] for i in range(0, stride, 2)]
        elif ctype == 2:
            lum = [(cur[i] + cur[i + 1] + cur[i + 2]) // 3
                   for i in range(0, stride, 3)]
        elif ctype == 6:
            lum = [(cur[i] + cur[i + 1] + cur[i + 2]) // 3
                   for i in range(0, stride, 4)]
        else:
            if palette is None:
                raise ValueError("paletted PNG missing PLTE")
            lum = [sum(palette[v]) // 3 for v in cur]
        rows.append(lum)
    return rows


def _ocr_parse_stdlib(b: bytes) -> str:
    """Template-matching OCR over a decoded bitmap (see module comment).
    Accepts uncompressed 24-bit BMP and 8-bit PNG (the two formats
    machine renders/screenshots actually produce without media libs)."""
    px = _decode_png(b) if b.startswith(_PNG_SIG) else _decode_bmp_24(b)
    ink = [[v < 128 for v in row] for row in px]
    h, w = len(ink), len(ink[0]) if ink else 0
    # segment lines on blank pixel-rows
    lines, start = [], None
    for r in range(h + 1):
        has_ink = r < h and any(ink[r])
        if has_ink and start is None:
            start = r
        elif not has_ink and start is not None:
            lines.append((start, r))
            start = None
    out_lines = []
    for y0, y1 in lines:
        # segment characters on blank pixel-columns
        cells, cstart, blanks, text = [], None, 0, []
        for c in range(w + 1):
            has_ink = c < w and any(ink[r][c] for r in range(y0, y1))
            if has_ink and cstart is None:
                if cells and blanks >= _GLYPH_W - 1:
                    cells.append(None)  # wide gap = space
                cstart, blanks = c, 0
            elif not has_ink and cstart is not None:
                cells.append((cstart, c))
                cstart, blanks = None, 1
            elif not has_ink:
                blanks += 1
        for cell in cells:
            if cell is None:
                text.append(" ")
                continue
            x0, x1 = cell
            bits = _trim_resample(
                [row[x0:x1] for row in ink[y0:y1]])
            best, best_d = "?", _OCR_MAX_HAMMING + 1
            for ch_name, tmpl in _TEMPLATES.items():
                d = sum(
                    bits[r][c] != tmpl[r][c]
                    for r in range(_GLYPH_H) for c in range(_GLYPH_W)
                )
                if d < best_d:
                    best, best_d = ch_name, d
            text.append(best)
        out_lines.append("".join(text))
    return "\n".join(out_lines)


def _mk_fallback_parser(lib_name: str, lib_fn, stdlib_fn, label: str):
    """Two-rung parser: the reference's library when importable, else the
    pure-stdlib extractor with matching output semantics."""
    state: dict[str, object] = {}

    def parse_bytes(b) -> tuple[str | None, str | None]:
        if b is None:
            return None, f"{label} parse failed: empty content"
        if "lib" not in state:
            try:
                state["lib"] = __import__(lib_name)
            except ImportError:
                state["lib"] = None
        try:
            if state["lib"] is not None:
                return lib_fn(state["lib"], bytes(b)), None
            return stdlib_fn(bytes(b)), None
        except Exception as exc:  # noqa: BLE001 — per-row fault tolerance
            return None, f"{label} parse failed: {exc}"

    return parse_bytes


_PARSERS = {
    # pdf, docx, AND image parse end-to-end in ANY environment: reference
    # library when importable, pure-stdlib extractor otherwise (the OCR
    # stdlib rung handles machine-rendered BMP text; photographs still
    # need pytesseract and error per-row honestly).
    "pdf": _mk_fallback_parser("pdfplumber", _pdf_parse,
                               _pdf_parse_stdlib, "pdf"),
    "docx": _mk_fallback_parser("docx", _docx_parse,
                                _docx_parse_stdlib, "docx"),
    "image": _mk_fallback_parser("pytesseract", _image_parse,
                                 _ocr_parse_stdlib, "ocr"),
}


def _text_parse(b) -> tuple[str | None, str | None]:
    # S5 — UTF-8 fallback (/root/reference/src/parsers.py:27-29)
    if b is None:
        return None, "text parse failed: empty content"
    try:
        return bytes(b).decode("utf-8"), None
    except UnicodeDecodeError as exc:
        return None, f"text parse failed: {exc}"


@F.pandas_udf(PARSE_RESULT)
def parse_content(fmt: pd.Series, content: pd.Series) -> pd.DataFrame:
    """Vectorized (format, bytes) → (raw_text, parse_error)."""
    texts, errors = [], []
    for f, b in zip(fmt, content):
        parser = _PARSERS.get(f, None)
        text, err = (parser(b) if parser else _text_parse(b))
        texts.append(text)
        errors.append(err)
    return pd.DataFrame({"raw_text": texts, "parse_error": errors})


def parse_documents(binary_df: DataFrame) -> DataFrame:
    """S1–S5 over a binaryFile scan: (path, content, …) →
    + (format, raw_text, parse_error)."""
    out = binary_df.withColumn("format", file_format(F.col("path")))
    parsed = parse_content(F.col("format"), F.col("content"))
    return (
        out.withColumn("_p", parsed)
        .withColumn("raw_text", F.col("_p.raw_text"))
        .withColumn("parse_error", F.col("_p.parse_error"))
        .drop("_p")
    )
