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


def _mk_docx_parser():
    """DOCX parser with two rungs: python-docx when importable (the
    reference's library), else the stdlib zip+XML extractor with identical
    output semantics — so DOCX parses end-to-end in any environment."""
    state: dict[str, object] = {}

    def parse_bytes(b) -> tuple[str | None, str | None]:
        if b is None:
            return None, "docx parse failed: empty content"
        if "lib" not in state:
            try:
                state["lib"] = __import__("docx")
            except ImportError:
                state["lib"] = None
        try:
            if state["lib"] is not None:
                return _docx_parse(state["lib"], bytes(b)), None
            return _docx_parse_stdlib(bytes(b)), None
        except Exception as exc:  # noqa: BLE001 — per-row fault tolerance
            return None, f"docx parse failed: {exc}"

    return parse_bytes


_PARSERS = {
    "pdf": _mk_parser(lambda: __import__("pdfplumber"), _pdf_parse, "pdf"),
    "docx": _mk_docx_parser(),
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
