"""Text analysis for training-data pipelines — language-ID, quality scoring,
token counting, document fingerprinting. All pure Catalyst expressions
(JVM-side, codegen'd); designed for 100-TB document tables.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small: language ID at corpus scale is a ratio heuristic, not a
# model (the container has no langdetect/fasttext).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"),
    "fr": ("le", "la", "les", "et", "est", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "las", "es", "una", "para", "con", "que"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased, empties dropped."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavoured token estimate: count of word pieces + punctuation
    marks + digit runs (a GPT-2-style pre-tokenizer regex, applied JVM-side).
    """
    pieces = F.regexp_extract_all(
        F.coalesce(text, F.lit("")),
        F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"),
        0,
    )
    return F.size(pieces)


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: blend of
    - length score   (saturating at 2000 chars)
    - alpha ratio    (letters / chars)
    - distinct-token ratio (repetition penalty)
    - stopword presence (en stopword hit ratio, capped)
    Mirrors the usual CC quality filters (Gopher/C4 style rules)."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t)
    toks = tokens(t)
    n_toks = F.size(toks)
    len_score = F.least(n_chars / F.lit(2000.0), F.lit(1.0))
    alpha_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / n_chars.cast("double")
    )
    distinct_ratio = F.when(n_toks == 0, F.lit(0.0)).otherwise(
        F.size(F.array_distinct(toks)) / n_toks.cast("double")
    )
    en_stops = F.array(*[F.lit(s) for s in _LANG_MARKERS["en"]])
    stop_hits = F.size(F.array_intersect(toks, en_stops))
    stop_score = F.least(stop_hits / F.lit(3.0), F.lit(1.0))
    return (
        len_score * 0.25 + alpha_ratio * 0.25 + distinct_ratio * 0.25 + stop_score * 0.25
    )


def detect_language(text: Column) -> Column:
    """Stopword-marker language ID: language with the most marker hits;
    'und' (undetermined) when nothing matches. Pure column expression —
    the marker arrays constant-fold."""
    toks = tokens(text)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.array_intersect(toks, arr)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column, k: int = 8, hash_fn=None) -> Column:
    """Document fingerprint: hash of the k numerically-smallest
    token-trigram hashes (winnowing-style rolling-hash selection, all
    JVM-side). Stable under whitespace normalization.

    ``hash_fn`` defaults to ``F.xxhash64``; pass ``hashing.md5_60`` for the
    DuckDB-reproducible oracle parameterization (same selection logic)."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - 3, F.lit(0)))
    tri_hashes = F.when(n < 3, F.array(hash_fn(F.concat_ws(" ", toks)))).otherwise(
        F.transform(idx, lambda i: hash_fn(F.concat_ws(" ", F.slice(toks, i + 1, 3))))
    )
    smallest = F.slice(F.array_sort(tri_hashes), 1, k)
    return hash_fn(F.concat_ws(",", F.transform(smallest, lambda h: h.cast("string"))))
