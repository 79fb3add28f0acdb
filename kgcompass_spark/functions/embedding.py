"""Text embedding stage (SURVEY.md P12) — batched Arrow UDF.

The reference encodes with a Jina code-embedding model on GPU
(embedding.py:84-133), truncating input to 4000/8000 chars. No model
weights ship in this container, so the ENCODER IS A DETERMINISTIC STUB: a
hashed bag-of-tokens projection into a unit vector. The Spark plumbing —
truncation, Arrow batching, array<float> column, cosine ranking downstream —
is the real design; a sentence-transformers/Jina encoder drops in by
replacing ``_encode_batch`` only (load the model once per worker from
SparkFiles/executor-local cache, never per batch).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64
MAX_INPUT_CHARS = 4000  # knowledge_graph.py:160 truncation


def _encode_batch(texts: list[str]) -> np.ndarray:
    """STUB ENCODER — deterministic hashed bag-of-tokens projection.
    REAL MODEL GOES HERE (jina-embeddings-v2-base-code or similar)."""
    out = np.zeros((len(texts), EMBED_DIM), dtype=np.float32)
    for i, t in enumerate(texts):
        for tok in (t or "")[:MAX_INPUT_CHARS].lower().split():
            h = int.from_bytes(
                hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
            )
            out[i, h % EMBED_DIM] += 1.0 if (h >> 8) % 2 == 0 else -1.0
        norm = np.linalg.norm(out[i])
        if norm > 0:
            out[i] /= norm
    return out


@F.pandas_udf(ArrayType(FloatType()))
def embed_text_udf(texts: pd.Series) -> pd.Series:
    vecs = _encode_batch(texts.fillna("").tolist())
    return pd.Series(list(vecs))
