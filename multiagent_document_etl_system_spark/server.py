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
  (plans/pipeline.run_pipeline), and the document's response row is
  returned as JSON; the temp dir is deleted in ``finally`` exactly like
  the reference's temp_uploads cleanup.
- ``POST /upload-schema``: JSON ``{"doc_type", "schema_json", "description"?}``
  — J5-gated (400 on invalid JSON), V7 content-hash id, MERGE-emulating
  upsert into the parquet registry (same path as ``cli upload-schema``).
- ``GET /health`` / ``GET /stats``: liveness + static configuration.

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


def _parse_multipart(content_type: str, body: bytes):
    """(filename, payload) from a multipart/form-data body — stdlib email
    parser; returns the first file-bearing part."""
    msg = BytesParser(policy=_EMAIL_POLICY).parsebytes(
        f"Content-Type: {content_type}\r\n\r\n".encode() + body)
    if not msg.is_multipart():
        raise ValueError("not multipart/form-data")
    for part in msg.iter_parts():
        fname = part.get_filename()
        if fname:
            return fname, part.get_payload(decode=True)
    raise ValueError("multipart body has no file part")


def process_document_bytes(filename: str, payload: bytes) -> dict:
    """One document through the whole engine pipeline; the JSON response
    row (K4 projection) for it."""
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
            return {"success": False, "filename": fname,
                    "error": "no document parsed from upload"}
        out = row.asDict(recursive=True)
        out["filename"] = fname
        return out
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
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if self.path == "/process":
                if ctype.startswith("multipart/form-data"):
                    fname, payload = _parse_multipart(ctype, body)
                else:
                    req = json.loads(body)
                    fname = req["filename"]
                    payload = base64.b64decode(req["content_b64"])
                self._send(200, process_document_bytes(fname, payload))
            elif self.path == "/upload-schema":
                req = json.loads(body)
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
                # J5 gate: invalid schema JSON is a client error
                self._send(200 if out.get("success") else 400, out)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})
        except Exception as exc:  # noqa: BLE001 — request-level fidelity
            self._send(500, {"success": False, "error": str(exc)})


def make_server(port: int = 0,
                registry: str = "spark-warehouse/schemas"
                ) -> ThreadingHTTPServer:
    """A ready-to-serve ThreadingHTTPServer (port 0 = ephemeral, for
    tests); callers own serve_forever()/shutdown()."""
    handler = type("Handler", (_Handler,), {"registry": registry})
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
