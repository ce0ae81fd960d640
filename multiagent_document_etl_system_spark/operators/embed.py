"""L4 — text embedding (SURVEY.md §2.4).

The reference embeds with sentence-transformers all-MiniLM-L6-v2 → 384
floats, cosine metric (/root/reference/src/pinecone_utils.py:46-53,12-13).

Spark-first design: an Arrow-batched Pandas UDF with a per-executor model
singleton — one model load per executor process, batches cross the
JVM↔Python boundary as Arrow columns, never row-at-a-time. The container
has no model weights, so the default is a DETERMINISTIC FAKE with the same
column contract (string → array<float> of EMBED_DIM, L2-normalized); the
real model loads behind an import-try and is a drop-in.

Scale: embedding 100 TB of text is Python-bound — the knobs are
`spark.sql.execution.arrow.maxRecordsPerBatch` (batch amortization) and
dedup-before-inference (exact_dedup upstream cuts repeated texts; the
reference embeds every call). Testdata ships precomputed embeddings.parquet
so no oracle query depends on a model.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 384  # /root/reference/src/pinecone_utils.py:13

_model = None  # per-executor singleton (lazy; survives across batches)


def _fake_vector(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """Deterministic stand-in: seed per 16-byte md5 block → unit vector.
    Stable across processes/runs (no Python hash salt)."""
    h = hashlib.md5(text.encode("utf-8", "ignore")).digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / n if n > 0 else v


def _load_real_model():
    try:
        from sentence_transformers import SentenceTransformer  # noqa: PLC0415
        return SentenceTransformer("all-MiniLM-L6-v2")
    except Exception:  # noqa: BLE001 — lib/weights absent in this container
        return None


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_text(texts: pd.Series) -> pd.Series:
    """L4 twin: batched embedding. Uses the real MiniLM model when
    importable, else the deterministic fake — same contract either way."""
    global _model
    if _model is None:
        _model = _load_real_model() or "fake"
    if _model != "fake":
        vecs = _model.encode(texts.fillna("").tolist(), convert_to_numpy=True)
        return pd.Series([v.astype(np.float32).tolist() for v in vecs])
    return pd.Series([
        _fake_vector(t if isinstance(t, str) else "").tolist() for t in texts
    ])


def with_embedding(df, text_col: str = "text",
                   out_col: str = "embedding"):
    """Append an embedding column (array<float>, unit-norm).

    Embedding inference is the most expensive per-row kernel in the whole
    engine (a model forward pass), so an under-partitioned scan must
    never serialize it: fan out first (no-op when the input already
    parallelizes; skipped on streaming inputs)."""
    if not df.isStreaming:
        from multiagent_document_etl_system_spark.io import ensure_parallelism
        df = ensure_parallelism(df)
    return df.withColumn(out_col, embed_text(F.col(text_col)))
