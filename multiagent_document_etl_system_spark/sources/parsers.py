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
    # pdf and docx parse end-to-end in ANY environment: reference library
    # when importable, pure-stdlib extractor otherwise. OCR has no stdlib
    # rung — image rows degrade to a per-row error without pytesseract.
    "pdf": _mk_fallback_parser("pdfplumber", _pdf_parse,
                               _pdf_parse_stdlib, "pdf"),
    "docx": _mk_fallback_parser("docx", _docx_parse,
                                _docx_parse_stdlib, "docx"),
    "image": _mk_parser(lambda: __import__("pytesseract"), _image_parse, "ocr"),
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
