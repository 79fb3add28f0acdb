"""Text embedding stage (SURVEY.md P12) — batched Arrow UDF, pluggable model.

The reference encodes with a Jina code-embedding model on GPU
(embedding.py:84-133), truncating input to 4000/8000 chars. Encoder
selection is config-gated here and ONLY here — swapping models requires no
change outside this file:

    KGCOMPASS_SPARK_ENCODER=stub                       (default, no deps)
    KGCOMPASS_SPARK_ENCODER=module:<python.module>     (custom encoder module)
    KGCOMPASS_SPARK_ENCODER=jinaai/jina-embeddings-v2-base-code
    KGCOMPASS_SPARK_ENCODER=<any sentence-transformers model id/path>

A real model loads once per executor process (module-level cache — workers
are forked per executor, not per batch) via sentence-transformers behind an
import-try; this container has no model weights, so the default STUB is a
deterministic hashed bag-of-tokens projection onto a unit vector. The
``module:`` scheme imports any module exposing ``encode(list[str]) ->
ndarray`` on the executors — the path a cluster uses to ship a custom
encoder wheel via ``spark-submit --py-files`` (``encoder_ngram`` in this
package is a dependency-free reference implementation, exercised
end-to-end by tests/test_related_ranking.py). The Spark plumbing —
truncation, Arrow batching, array<float> column, cosine ranking
downstream — is identical for every scheme.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64  # stub dim; real models define their own
MAX_INPUT_CHARS = 4000  # knowledge_graph.py:160 truncation

_ENCODER_ENV = "KGCOMPASS_SPARK_ENCODER"
_MODEL_CACHE: dict[str, object] = {}


def _encoder_name() -> str:
    return os.environ.get(_ENCODER_ENV, "stub")


def _load_model(name: str):
    """Executor-local singleton: one model per python worker process."""
    if name not in _MODEL_CACHE:
        if name.startswith("module:"):
            import importlib

            mod = importlib.import_module(name[len("module:"):])
            if not callable(getattr(mod, "encode", None)):
                raise RuntimeError(
                    f"{_ENCODER_ENV}={name}: module must expose "
                    "encode(list[str]) -> ndarray"
                )
            _MODEL_CACHE[name] = mod
        else:
            try:
                from sentence_transformers import SentenceTransformer
            except ImportError as e:  # pragma: no cover - container has no model libs
                raise RuntimeError(
                    f"{_ENCODER_ENV}={name} requires sentence-transformers; "
                    "install it or unset the env var to use the stub encoder"
                ) from e
            _MODEL_CACHE[name] = SentenceTransformer(name)
    return _MODEL_CACHE[name]


def _encode_stub(texts: list[str]) -> np.ndarray:
    """Deterministic hashed bag-of-tokens projection (unit vectors)."""
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


def _encode_batch_named(name: str, texts: list[str]) -> np.ndarray:
    if name == "stub":
        return _encode_stub(texts)
    model = _load_model(name)
    trunc = [(t or "")[:MAX_INPUT_CHARS] for t in texts]
    if name.startswith("module:"):
        return np.asarray(model.encode(trunc), dtype=np.float32)
    vecs = model.encode(
        trunc,
        normalize_embeddings=True,
        show_progress_bar=False,
    )
    return np.asarray(vecs, dtype=np.float32)


def _encode_batch(texts: list[str]) -> np.ndarray:
    return _encode_batch_named(_encoder_name(), texts)


def encode_one(text: str) -> list[float]:
    """Driver-side single-text encode (e.g. the root issue) — same encoder,
    result broadcast as a literal array into ranking plans."""
    return [float(x) for x in _encode_batch([text])[0]]


def embed_text_udf(col):
    """Batched Arrow-encoder column. The encoder NAME is resolved on the
    DRIVER at plan-construction time and shipped inside the UDF closure —
    executor python workers are long-lived and reused, so reading the env
    var worker-side would pin whatever was set when the first worker
    forked (and on a real cluster would require configuring every
    executor's environment instead of just the driver)."""
    name = _encoder_name()

    @F.pandas_udf(ArrayType(FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        vecs = _encode_batch_named(name, texts.fillna("").tolist())
        return pd.Series(list(vecs))

    return _udf(col)
