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


def _image_parse(lib, b: bytes) -> str:
    # pytesseract full-page OCR (/root/reference/src/parsers.py:90-105)
    import io

    from PIL import Image
    return lib.image_to_string(Image.open(io.BytesIO(b)))


_PARSERS = {
    "pdf": _mk_parser(lambda: __import__("pdfplumber"), _pdf_parse, "pdf"),
    "docx": _mk_parser(lambda: __import__("docx"), _docx_parse, "docx"),
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
