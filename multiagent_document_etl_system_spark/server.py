"""HTTP service facade (SURVEY.md §3): the reference's four endpoints —
``POST /process``, ``POST /upload-schema``, ``GET /health``, ``GET /stats``
(/root/reference/src/app.py:46-188) — served by the engine with ONLY the
Python standard library (http.server); a user of the reference can point
their existing client here unchanged.

- ``POST /process``: multipart/form-data with a ``file`` field (the
  reference's contract) or JSON ``{"filename": ..., "content_b64": ...}``.
  The upload is sanitized (P4 path-traversal guard), written to a fresh
  per-request temp landing dir, parsed (S1–S5 dispatch incl. the stdlib
  PDF/DOCX/BMP/PNG/JPEG rungs), run through the ONE-plan pipeline
  (plans/pipeline.run_pipeline), and the response uses the reference's
  wrapper shape — ``{"success", "error", "data": {"record_id",
  "doc_type", "extracted", "file_url"}, "logs", "filename"}``
  (/root/reference/src/agents.py:303-320, src/app.py:81-96); the temp
  dir is deleted in ``finally`` exactly like the reference's
  temp_uploads cleanup. Malformed JSON/base64 is a 400, not a 500.
- ``POST /upload-schema``: ``doc_type`` + ``schema_json`` as
  application/x-www-form-urlencoded or multipart form fields (the
  reference declares them as FastAPI ``Form(...)`` — src/app.py:119-122
  — so its existing clients post forms), with JSON bodies also accepted.
  J5-gated (400 on invalid schema JSON), V7 content-hash id,
  MERGE-emulating upsert into the parquet registry (same path as
  ``cli upload-schema``).
- ``GET /health`` / ``GET /stats``: liveness + static configuration.

Request bodies are capped (``max_body``, default 64 MiB — documents are
single uploads); oversize requests get 413 without buffering the body.

Scale posture: this facade is the INTERACTIVE path (one document per
request, exactly the reference's shape); bulk work belongs to
``cli process <landing_dir>`` / Structured Streaming, which run the same
pipeline over directories. One SparkSession is shared across requests
(created lazily on the first /process), so steady-state request cost is
one small Spark job, not a session boot.
"""

from __future__ import annotations

import base64
import json
import re
import shutil
import tempfile
import threading
from email.parser import BytesParser
from email.policy import default as _EMAIL_POLICY
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_SPARK = None
_SPARK_LOCK = threading.Lock()


def _spark():
    global _SPARK
    with _SPARK_LOCK:
        if _SPARK is None:
            from multiagent_document_etl_system_spark.session import get_spark
            _SPARK = get_spark(app_name="doc-etl-server")
        return _SPARK


def _safe_filename(name: str) -> str:
    """P4 twin (functions/text.safe_filename, /root/reference/src/app.py:29-34):
    strip path components, keep only word/space/dash/dot characters."""
    base = name.replace("\\", "/").rsplit("/", 1)[-1]
    return re.sub(r"[^\w\s\-.]", "", base) or "upload.bin"


def _multipart_parts(content_type: str, body: bytes):
    """The parts of a multipart/form-data body — stdlib email parser."""
    msg = BytesParser(policy=_EMAIL_POLICY).parsebytes(
        f"Content-Type: {content_type}\r\n\r\n".encode() + body)
    if not msg.is_multipart():
        raise ValueError("not multipart/form-data")
    return list(msg.iter_parts())


def _parse_multipart(content_type: str, body: bytes):
    """(filename, payload) from a multipart/form-data body — returns the
    first file-bearing part."""
    for part in _multipart_parts(content_type, body):
        fname = part.get_filename()
        if fname:
            return fname, part.get_payload(decode=True)
    raise ValueError("multipart body has no file part")


def _form_fields(content_type: str, body: bytes) -> dict:
    """The reference declares /upload-schema's doc_type/schema_json as
    FastAPI ``Form(...)`` fields (src/app.py:119-122), i.e. its clients
    post application/x-www-form-urlencoded or multipart bodies. Accept
    both, plus JSON for convenience. Raises ValueError on bodies that
    parse as none of the three."""
    import urllib.parse

    if content_type.startswith("multipart/form-data"):
        fields = {}
        for part in _multipart_parts(content_type, body):
            name = part.get_param("name", header="content-disposition")
            if name:
                payload = part.get_payload(decode=True)
                fields[name] = payload.decode("utf-8", "replace")
        return fields
    if content_type.startswith("application/x-www-form-urlencoded"):
        qs = urllib.parse.parse_qs(body.decode("utf-8", "replace"),
                                   keep_blank_values=True)
        return {k: v[0] for k, v in qs.items()}
    req = json.loads(body)
    if not isinstance(req, dict):
        raise ValueError("JSON body must be an object")
    return req


def process_document_bytes(filename: str, payload: bytes) -> dict:
    """One document through the whole engine pipeline, wrapped in the
    reference's response shape (src/agents.py:303-320 response_agent +
    src/app.py:81-96 logs/filename attachment): ``{"success", "error",
    "data": {"record_id", "doc_type", "extracted", "file_url", ...},
    "logs", "filename"}`` — ``data`` is None on failure."""
    from pyspark.sql import functions as F

    from multiagent_document_etl_system_spark.io import read_landing_dir
    from multiagent_document_etl_system_spark.plans.pipeline import (
        run_pipeline,
    )
    from multiagent_document_etl_system_spark.sources.parsers import (
        parse_documents,
    )

    spark = _spark()
    tmp = tempfile.mkdtemp(prefix="doc_etl_upload_")
    fname = _safe_filename(filename)
    logs = [f"Received file: {fname}", "Starting ETL pipeline..."]
    try:
        with open(f"{tmp}/{fname}", "wb") as fh:
            fh.write(payload)
        parsed = parse_documents(read_landing_dir(spark, tmp))
        docs = parsed.select(
            F.xxhash64("path").alias("doc_id"),
            F.coalesce("raw_text", F.lit("")).alias("text"),
            F.lit("und").alias("lang"),
            F.lit(fname).alias("source"),
            F.coalesce(F.length("raw_text"), F.lit(0)).cast("bigint")
            .alias("n_chars"),
            "parse_error",
        )
        row = run_pipeline(spark, docs).first()
        if row is None:
            logs.append("Error: no document parsed from upload")
            return {"success": False,
                    "error": "no document parsed from upload",
                    "data": None, "logs": logs, "filename": fname}
        r = row.asDict(recursive=True)
        if r["success"]:
            resp = {
                "success": True,
                "error": None,
                "data": {
                    "record_id": r["record_id"],
                    "doc_type": r["doc_type"],
                    "extracted": {"email": r["email"],
                                  "date_str": r["date_str"],
                                  "amount": r["amount"]},
                    "file_url": r["file_url"],
                    # engine extras beyond the reference's four data keys
                    "is_valid": r["is_valid"],
                    "feedback": r["feedback"],
                    "retry_count": r["retry_count"],
                },
            }
            logs.append("Document processed successfully")
        else:
            resp = {"success": False, "error": r["error"], "data": None}
            logs.append(f"Error: {r['error']}")
        resp["logs"] = logs
        resp["filename"] = fname
        return resp
    finally:
        shutil.rmtree(tmp, ignore_errors=True)  # src/app.py:109-116 twin


def upload_schema(doc_type: str, schema_json: str,
                  description: str | None = None,
                  registry: str = "spark-warehouse/schemas") -> dict:
    import argparse

    from multiagent_document_etl_system_spark.cli import cmd_upload_schema

    return cmd_upload_schema(argparse.Namespace(
        doc_type=doc_type, schema_json=schema_json,
        description=description, registry=registry))


def stats() -> dict:
    import argparse

    from multiagent_document_etl_system_spark.cli import cmd_stats

    return cmd_stats(argparse.Namespace(registry="spark-warehouse/schemas"))


class _Handler(BaseHTTPRequestHandler):
    registry = "spark-warehouse/schemas"
    #: request-body cap — single-document uploads; oversize → 413 before
    #: any buffering
    max_body = 64 * 1024 * 1024

    def _send(self, code: int, obj: dict) -> None:
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def do_GET(self):  # noqa: N802 — http.server contract
        if self.path == "/health":
            self._send(200, {"status": "healthy",
                             "service": "multiagent-document-etl-spark"})
        elif self.path == "/stats":
            self._send(200, stats())
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802
        try:
            length = int(self.headers.get("Content-Length", "0"))
            if length > self.max_body:
                self._send(413, {"success": False,
                                 "error": f"request body exceeds "
                                          f"{self.max_body} bytes"})
                # drain in bounded chunks (never buffered whole) so the
                # client reliably sees the 413 instead of a reset
                remaining = length
                while remaining > 0:
                    chunk = self.rfile.read(min(65536, remaining))
                    if not chunk:
                        break
                    remaining -= len(chunk)
                return
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if self.path == "/process":
                # malformed envelopes (bad JSON / bad base64 / missing
                # keys) are client errors — 400, never 500
                try:
                    if ctype.startswith("multipart/form-data"):
                        fname, payload = _parse_multipart(ctype, body)
                    else:
                        req = json.loads(body)
                        fname = req["filename"]
                        payload = base64.b64decode(req["content_b64"],
                                                   validate=True)
                except (ValueError, KeyError, TypeError) as exc:
                    self._send(400, {"success": False,
                                     "error": f"bad request: {exc}",
                                     "data": None, "logs": []})
                    return
                self._send(200, process_document_bytes(fname, payload))
            elif self.path == "/upload-schema":
                try:
                    req = _form_fields(ctype, body)
                except (ValueError, TypeError) as exc:
                    self._send(400, {"success": False,
                                     "error": f"bad request: {exc}"})
                    return
                doc_type = req.get("doc_type")
                if "schema_json" in req:
                    schema_json = req["schema_json"]
                elif "schema" in req:
                    schema_json = json.dumps(req["schema"])
                else:
                    schema_json = None
                if not doc_type or not schema_json:
                    self._send(400, {"success": False,
                                     "error": "doc_type and schema_json "
                                              "are required"})
                    return
                out = upload_schema(doc_type, schema_json,
                                    req.get("description"),
                                    registry=self.registry)
                if out.get("success"):
                    out.setdefault(
                        "message",
                        f"Schema for '{doc_type}' uploaded successfully")
                # J5 gate: invalid schema JSON is a client error
                self._send(200 if out.get("success") else 400, out)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})
        except Exception as exc:  # noqa: BLE001 — request-level fidelity
            self._send(500, {"success": False, "error": str(exc)})


def make_server(port: int = 0,
                registry: str = "spark-warehouse/schemas",
                max_body: int | None = None) -> ThreadingHTTPServer:
    """A ready-to-serve ThreadingHTTPServer (port 0 = ephemeral, for
    tests); callers own serve_forever()/shutdown()."""
    attrs: dict = {"registry": registry}
    if max_body is not None:
        attrs["max_body"] = max_body
    handler = type("Handler", (_Handler,), attrs)
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(prog="doc-etl-server")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--registry", default="spark-warehouse/schemas")
    args = p.parse_args(argv)
    srv = make_server(args.port, args.registry)
    print(json.dumps({"serving": True, "port": srv.server_address[1]}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
