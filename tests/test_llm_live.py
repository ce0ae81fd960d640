"""LIVE loopback LLM-endpoint tests (r7 verdict order #4).

A real HTTP server on 127.0.0.1 speaks the Groq/OpenAI chat-completions
wire shape the reference calls (/root/reference/src/groq_client.py:32-37);
``http_chat_client`` points ``classify_llm`` / ``extract_llm`` /
``extract_llm_retry`` at it OVER REAL SOCKETS — executor worker processes
make genuine HTTP round-trips, exercising network serialization,
timeouts, and malformed-response handling that an in-process callable
never touches. The stub's replies reuse the deterministic mock clients,
so twin-equivalence stays directly assertable end-to-end.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from multiagent_document_etl_system_spark.io import load_table
from multiagent_document_etl_system_spark.operators import classify, extract
from multiagent_document_etl_system_spark.operators.llm_client import (
    CHAT_PATH,
    http_chat_client,
)

SF_DIR = "/root/testdata/sf0.001"

#: request bodies the server saw, for wire-shape assertions
_SEEN: list[dict] = []


def _route(prompt: str) -> str:
    """Scripted model behavior, keyed on document content markers."""
    if "RETRYDOC" in prompt:
        if "Previous attempt was rejected" in prompt:
            return json.dumps({"email": "order@example.com",
                               "date": "2024-03-05", "amount": 49.99})
        # first attempt: violates all three validation rule families
        return json.dumps({"email": "not-an-email",
                           "date": "2024-99-99", "amount": "abc"})
    if "HOPELESSDOC" in prompt:
        return json.dumps({"email": "still@bad", "date": "x", "amount": "y"})
    if prompt.startswith("Classify"):
        return classify.mock_llm_client(prompt)
    return extract.mock_llm_extract_client(prompt)


class _ChatHandler(BaseHTTPRequestHandler):
    def do_POST(self):  # noqa: N802 — http.server API
        assert self.path == CHAT_PATH, self.path
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"])))
        _SEEN.append(body)
        prompt = body["messages"][0]["content"]
        if "SLOWDOC" in prompt:
            time.sleep(2.0)
        if "MALFORMEDDOC" in prompt:
            payload = {"error": "no choices here"}
        else:
            payload = {"choices": [{"message": {"content": _route(prompt)}}]}
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def chat_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ChatHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_classify_live_matches_twin_over_real_sockets(spark, chat_url):
    """End-to-end: executor processes POST real HTTP requests; labels
    equal the deterministic twin's on the full sf0.001 documents table."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    twin = {r["doc_id"]: r["doc_type"]
            for r in classify.classify(docs).collect()}
    live = {r["doc_id"]: r["doc_type"]
            for r in classify.classify_llm(
                docs, client=http_chat_client(chat_url)).collect()}
    assert live == twin
    assert None not in live.values()  # no row degraded on the happy path


def test_extract_live_matches_twin_over_real_sockets(spark, chat_url):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    twin = {r["doc_id"]: (r["email"], r["date_str"])
            for r in extract.extract_fields(docs).collect()}
    out = extract.extract_llm(
        docs, client=http_chat_client(chat_url)).collect()
    assert len(out) == len(twin)
    for r in out:
        d = json.loads(r["extracted"])
        em, dt = twin[r["doc_id"]]
        assert d["email"] == em and d["date"] == dt


def test_wire_shape_is_the_reference_contract(chat_url):
    """The client speaks EXACTLY the reference's call: model + one user
    message + max_tokens + temperature; reply read from
    choices[0].message.content."""
    _SEEN.clear()
    client = http_chat_client(chat_url, model="test-model", max_tokens=77,
                              temperature=0.5, api_key="k")
    reply = client(classify.build_classify_prompt("invoice order total"))
    assert reply.lower().startswith("invoice")
    body = _SEEN[-1]
    assert body["model"] == "test-model"
    assert body["max_tokens"] == 77 and body["temperature"] == 0.5
    assert body["messages"] == [
        {"role": "user", "content": classify.build_classify_prompt(
            "invoice order total")}]


def test_timeout_and_malformed_degrade_per_row_not_per_task(spark, chat_url):
    """One slow document (server sleeps past the client timeout) and one
    malformed-response document NULL out — the other rows in the SAME
    Arrow batch still classify. The task never fails."""
    # keyword vocab per operators/classify.LABEL_KEYWORDS:
    # invoice=(value, order), report=(agg, group)
    rows = [(1, "invoice order value total due"),
            (2, "SLOWDOC invoice order value"),
            (3, "MALFORMEDDOC invoice order value"),
            (4, "agg group summary findings")]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    got = {r["doc_id"]: r["doc_type"]
           for r in classify.classify_llm(
               df, client=http_chat_client(chat_url, timeout=1.0))
           .collect()}
    assert got[1] == "invoice" and got[4] == "report"
    assert got[2] is None and got[3] is None

    ex = {r["doc_id"]: r["extracted"]
          for r in extract.extract_llm(
              df, client=http_chat_client(chat_url, timeout=1.0))
          .collect()}
    assert ex[2] is None and ex[3] is None
    assert ex[1] is not None and ex[4] is not None


def test_retry_on_feedback_live(spark, chat_url):
    """The reference's validation-feedback loop (src/agents.py:250-263)
    over real sockets: the first extraction violates all three rule
    families, the retry prompt carries the feedback, the model corrects,
    and the row lands valid with retry_count=1. A document the model
    never fixes stays invalid after the bounded retry."""
    rows = [(1, "RETRYDOC order@example.com due 2024-03-05 49.99"),
            (2, "HOPELESSDOC nothing to see"),
            (3, "invoice from billing@example.com total 12.50 2024-01-02")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["extraction"].asDict()
           for r in extract.extract_llm_retry(
               df, client=http_chat_client(chat_url)).collect()}

    fixed = out[1]
    assert fixed["retry_count"] == 1 and fixed["is_valid"] is True
    assert json.loads(fixed["extracted"]) == {
        "email": "order@example.com", "date": "2024-03-05", "amount": 49.99}

    hopeless = out[2]
    assert hopeless["retry_count"] == 1 and hopeless["is_valid"] is False
    assert "malformed email" in hopeless["feedback"]
    assert "impossible date" in hopeless["feedback"]
    assert "non-numeric amount" in hopeless["feedback"]

    clean = out[3]
    assert clean["retry_count"] == 0 and clean["is_valid"] is True

    # the retry prompt really carried the feedback over the wire
    retry_prompts = [b["messages"][0]["content"] for b in _SEEN
                     if "Previous attempt was rejected" in
                     b["messages"][0]["content"]]
    assert any("RETRYDOC" in p and "malformed email" in p
               for p in retry_prompts)


def test_retry_client_failure_degrades_per_row(spark, chat_url):
    """A client failure inside the retry loop degrades that row with
    feedback='client error', is_valid=False — not a task failure."""
    df = spark.createDataFrame(
        [(1, "SLOWDOC whatever"), (2, "ok text billing@example.com")],
        "doc_id long, text string").coalesce(1)
    out = {r["doc_id"]: r["extraction"].asDict()
           for r in extract.extract_llm_retry(
               df, client=http_chat_client(chat_url, timeout=1.0))
           .collect()}
    assert out[1]["extracted"] is None
    assert out[1]["is_valid"] is False
    assert out[1]["feedback"] == "client error"
    assert out[2]["is_valid"] is True
