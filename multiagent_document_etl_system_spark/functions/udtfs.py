"""Python UDTFs (Spark 4 user-defined TABLE functions).

One sanctioned demonstration of the API: a sentence splitter usable in a
LATERAL join. UDTFs are the Python path — each row crosses into a Python
worker — so the REGISTRY keeps sentence segmentation JVM-side
(ta_chunk_segments' split/posexplode plan) and this exists for the cases a
Catalyst expression genuinely can't cover (stateful segmenters, external
tokenizer libraries) plus as API-coverage evidence. Arrow-optimized via
useArrow (batch transfer, not per-row pickling).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_RE = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="idx int, sentence string", useArrow=True)
class SplitSentences:
    """LATERAL-joinable sentence splitter: one output row per sentence
    with its ordinal. NULL/empty text yields no rows (the lateral join
    drops the doc, exactly like a Generate with outer=false)."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        if not text:
            return
        for i, s in enumerate(
                p.strip() for p in _SENT_RE.split(text) if p.strip()):
            yield i, s


def register_udtfs(spark) -> None:
    """Register the UDTFs for SQL use (``split_sentences(...)`` in a
    LATERAL position)."""
    spark.udtf.register("split_sentences", SplitSentences)
