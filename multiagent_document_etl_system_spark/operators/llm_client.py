"""Live LLM endpoint client over REAL sockets — the Groq/OpenAI
chat-completions wire shape the reference speaks
(/root/reference/src/groq_client.py:32-37: POST messages=[{role: user,
content: prompt}] → choices[0].message.content).

:func:`http_chat_client` builds the ``Callable[[str], str]`` that
``classify_llm`` / ``extract_llm`` / ``extract_llm_retry`` accept as
their pluggable ``client``. The closure holds only picklable config
(cloudpickle ships it to executors once; each executor process calls the
endpoint directly — the driver never proxies model traffic). Transport
is stdlib urllib — no extra dependency; a high-QPS deployment would swap
in a pooled HTTP/2 client behind the same one-function contract.

Failure contract: a malformed response body raises ``ValueError``; HTTP
and socket errors (including timeouts) raise their native ``OSError``
subclasses. The Pandas-UDF wrappers catch per ROW, so one slow or broken
document degrades that row (NULL output), never the Spark task — the
reference's per-document try/except (src/agents.py:96-101), preserved at
Arrow-batch granularity.
"""

from __future__ import annotations

import json
import urllib.request

#: the reference's default model name (src/groq_client.py:8) — a contract
#: value, not a live dependency
DEFAULT_MODEL = "llama-3.1-8b-instant"

CHAT_PATH = "/openai/v1/chat/completions"


def http_chat_client(base_url: str, model: str = DEFAULT_MODEL,
                     max_tokens: int = 1024, temperature: float = 0.0,
                     timeout: float = 30.0, api_key: str | None = None):
    """``Callable[[str], str]``: prompt → assistant reply, over a real
    HTTP round-trip to ``{base_url}/openai/v1/chat/completions``.

    temperature defaults to 0.0 (NOT the reference's 0.7): a data
    pipeline wants reproducible labels; flip it per-call-site if
    exploration is ever the point.
    """
    url = base_url.rstrip("/") + CHAT_PATH
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"

    def client(prompt: str) -> str:
        body = json.dumps({
            "model": model,
            "messages": [{"role": "user", "content": prompt}],
            "max_tokens": max_tokens,
            "temperature": temperature,
        }).encode("utf-8")
        req = urllib.request.Request(url, data=body, headers=headers,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = json.loads(resp.read().decode("utf-8"))
        try:
            content = payload["choices"][0]["message"]["content"]
        except (KeyError, IndexError, TypeError):
            raise ValueError(
                "malformed chat-completions response: "
                f"{str(payload)[:120]}") from None
        if not isinstance(content, str):
            raise ValueError("chat-completions content is not a string")
        return content

    return client
