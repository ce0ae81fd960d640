"""HTTP facade (server.py): the reference's four endpoints driven over a
REAL socket — multipart and JSON-b64 uploads through the full parse +
pipeline, schema registration with the J5 gate, health/stats."""

from __future__ import annotations

import base64
import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from multiagent_document_etl_system_spark import server as srv

    # share the test session instead of booting a second JVM
    srv._SPARK = spark
    registry = str(tmp_path_factory.mktemp("registry") / "schemas")
    s = srv.make_server(0, registry=registry, max_body=256 * 1024)
    t = threading.Thread(target=s.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{s.server_address[1]}"
    s.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url: str, data: bytes, ctype: str):
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_stats(server):
    code, h = _get(f"{server}/health")
    assert code == 200 and h["status"] == "healthy"
    code, st = _get(f"{server}/stats")
    assert code == 200 and st["embedding_dimension"] == 384


def test_process_json_b64_text_document(server):
    # classifier keywords are corpus-vocabulary config: "value"/"order"
    # score the invoice label (operators/classify.LABEL_KEYWORDS)
    text = ("Purchase order of total value due.\n"
            "Billed to client@example.com on 2024-03-15 "
            "for the amount of $1,250.00. " * 3)
    code, out = _post(
        f"{server}/process",
        json.dumps({"filename": "../../etc/invoice one.txt",
                    "content_b64":
                        base64.b64encode(text.encode()).decode()}).encode(),
        "application/json")
    assert code == 200, out
    # reference response wrapper (src/agents.py:303-320 + src/app.py:81-96):
    # success/error/data{record_id,doc_type,extracted,file_url}/logs/filename
    assert out["success"] is True
    assert out["error"] is None
    # P4 path-traversal guard: directory components stripped
    assert out["filename"] == "invoice one.txt"
    data = out["data"]
    assert data["doc_type"] == "invoice"
    assert data["extracted"]["email"] == "client@example.com"
    assert data["extracted"]["date_str"] == "2024-03-15"
    assert data["is_valid"] is True
    assert data["record_id"] and data["file_url"].startswith("s3://")
    assert any("processed successfully" in line for line in out["logs"])


def test_process_multipart_jpeg_through_ocr(server):
    from multiagent_document_etl_system_spark.sources.parsers import (
        render_text_jpeg,
    )

    jpg = render_text_jpeg("RECEIPT 9 TOTAL 45", subsampling="420")
    boundary = "testboundary42"
    body = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; '
        f'filename="scan.jpg"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + jpg + f"\r\n--{boundary}--\r\n".encode()
    code, out = _post(f"{server}/process", body,
                      f"multipart/form-data; boundary={boundary}")
    assert code == 200, out
    assert out["filename"] == "scan.jpg"
    # the stdlib JPEG OCR rung parsed the upload; the text is short, so
    # the pipeline's too-short gate reports honestly (reference behavior
    # for tiny docs) — parse itself must NOT be the failure
    assert out["error"] is None or "parse failed" not in out["error"]


def test_upload_schema_gate_and_upsert(server):
    good = json.dumps({"doc_type": "invoice",
                       "schema": {"fields": {"email": "string"}}}).encode()
    code, out = _post(f"{server}/upload-schema", good, "application/json")
    assert code == 200 and out["success"] and out["schema_id"]
    # J5 gate: malformed schema_json -> 400, success false
    bad = json.dumps({"doc_type": "invoice",
                      "schema_json": "{not json"}).encode()
    code, out = _post(f"{server}/upload-schema", bad, "application/json")
    assert code == 400 and not out["success"]
    # missing fields -> 400
    code, out = _post(f"{server}/upload-schema",
                      json.dumps({"doc_type": "x"}).encode(),
                      "application/json")
    assert code == 400


def test_unknown_path_404(server):
    import urllib.error

    try:
        urllib.request.urlopen(f"{server}/nope", timeout=30)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 404
    assert raised


def test_concurrent_process_requests(server):
    """ThreadingHTTPServer + one shared SparkSession: four simultaneous
    /process uploads must all complete correctly (Spark schedules
    concurrent jobs from multiple threads; the session is thread-safe).
    Each document carries a distinct email so responses can't be
    cross-wired between requests."""
    import concurrent.futures

    def one(i: int):
        text = (f"Purchase order of total value due.\n"
                f"Billed to user{i}@example.com on 2024-03-1{i} "
                f"for the amount of $1,000.0{i}. " * 3)
        code, out = _post(
            f"{server}/process",
            json.dumps({"filename": f"doc{i}.txt",
                        "content_b64":
                            base64.b64encode(text.encode()).decode()}
                       ).encode(),
            "application/json")
        return i, code, out

    with concurrent.futures.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(one, range(4)))
    for i, code, out in results:
        assert code == 200, out
        assert out["success"] is True
        assert out["filename"] == f"doc{i}.txt"
        assert out["data"]["extracted"]["email"] == f"user{i}@example.com"
        assert out["data"]["extracted"]["date_str"] == f"2024-03-1{i}"


def test_upload_schema_form_encoded(server):
    """The reference declares doc_type/schema_json as FastAPI Form(...)
    fields — its existing clients post urlencoded or multipart forms, and
    both must register the schema (ADVICE r6, medium)."""
    import urllib.parse

    form = urllib.parse.urlencode({
        "doc_type": "receipt",
        "schema_json": json.dumps({"fields": {"total": "double"}}),
    }).encode()
    code, out = _post(f"{server}/upload-schema", form,
                      "application/x-www-form-urlencoded")
    assert code == 200 and out["success"] and out["schema_id"], out
    assert "uploaded successfully" in out["message"]

    boundary = "formboundary7"
    body = b"".join(
        (f"--{boundary}\r\n"
         f'Content-Disposition: form-data; name="{k}"\r\n\r\n'
         f"{v}\r\n").encode()
        for k, v in [("doc_type", "contract"),
                     ("schema_json", json.dumps({"fields": {}}))]
    ) + f"--{boundary}--\r\n".encode()
    code, out = _post(f"{server}/upload-schema", body,
                      f"multipart/form-data; boundary={boundary}")
    assert code == 200 and out["success"], out
    assert out["doc_type"] == "contract"

    # the J5 gate holds on the form path too
    bad = urllib.parse.urlencode({"doc_type": "x",
                                  "schema_json": "{nope"}).encode()
    code, out = _post(f"{server}/upload-schema", bad,
                      "application/x-www-form-urlencoded")
    assert code == 400 and not out["success"]


def test_process_bad_envelope_is_400_not_500(server):
    # malformed JSON body
    code, out = _post(f"{server}/process", b"{not json",
                      "application/json")
    assert code == 400 and not out["success"]
    # bad base64 payload
    code, out = _post(f"{server}/process",
                      json.dumps({"filename": "a.txt",
                                  "content_b64": "!!!notb64"}).encode(),
                      "application/json")
    assert code == 400 and not out["success"]
    # missing keys
    code, out = _post(f"{server}/process",
                      json.dumps({"filename": "a.txt"}).encode(),
                      "application/json")
    assert code == 400 and not out["success"]


def test_oversize_body_is_413(server):
    big = b"x" * (300 * 1024)  # server fixture caps max_body at 256 KiB
    code, out = _post(f"{server}/process", big, "application/json")
    assert code == 413 and not out["success"]
