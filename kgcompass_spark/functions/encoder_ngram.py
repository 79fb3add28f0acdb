"""Dependency-free character-n-gram hashing encoder.

The reference implementation of the ``module:`` encoder scheme
(``KGCOMPASS_SPARK_ENCODER=module:kgcompass_spark.functions.encoder_ngram``)
— the contract any custom encoder shipped via ``spark-submit --py-files``
must satisfy: a module-level ``encode(texts: list[str]) -> ndarray`` of
unit vectors, deterministic across workers.

Deliberately different from the default stub (character trigrams with a
signed feature hash, 128 dims) so tests can prove the custom module
actually loaded: its output must differ from the stub's while both stay
deterministic. At corpus scale this encoder is also a genuinely usable
cheap similarity signal (the standard hashing-trick text vectorizer).
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 128
_N = 3


def encode(texts: list[str]) -> np.ndarray:
    out = np.zeros((len(texts), DIM), dtype=np.float32)
    for i, t in enumerate(texts):
        s = (t or "").lower()
        for j in range(max(0, len(s) - _N + 1)):
            g = s[j : j + _N]
            h = int.from_bytes(
                hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(),
                "little",
            )
            out[i, h % DIM] += 1.0 if (h >> 8) % 2 == 0 else -1.0
        norm = np.linalg.norm(out[i])
        if norm > 0:
            out[i] /= norm
    return out
