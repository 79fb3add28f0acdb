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


def _top_run(sorted_arr: Column) -> Column:
    """(gram, count) of the most frequent element of a SORTED array, via a
    single sequential fold (F.aggregate) over adjacent runs — O(n) per row,
    no shuffle, whole-stage codegen'd. Ties break to the run reached first
    in sorted order, i.e. the lexicographically smallest gram (strict >),
    which a SQL replay expresses as ORDER BY cnt DESC, gram ASC LIMIT 1."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit("").alias("best"),
        F.lit(0).cast("long").alias("bestrun"),
    )

    def merge(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["bestrun"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, x).otherwise(acc["best"]).alias("best"),
            F.when(better, run).otherwise(acc["bestrun"]).alias("bestrun"),
        )

    return F.aggregate(
        sorted_arr, init, merge,
        lambda acc: F.struct(acc["best"].alias("gram"), acc["bestrun"].alias("cnt")),
    )


def repetition_signals(text: Column) -> Column:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, the standard
    pretraining-corpus quality gate; same family as NeMo-Curator/datatrove
    repetition filters) as ONE struct column — all pure Catalyst, per-row,
    zero shuffles, so the filter is a narrow map over a 100-TB corpus:

      n_lines            non-empty line count
      dup_line_frac      (n_lines − distinct lines) / n_lines
      dup_line_char_frac chars in lines whose text occurs >1× / total line chars
      top2/3/4_char_frac count(most frequent word n-gram) × len(gram)
                         / len(text) — the "fraction of characters in the
                         most common n-gram" rule (overlaps counted, as the
                         published filters do)

    Degenerate inputs follow :func:`...operators.dedup.shingles` (fewer
    than n tokens → the whole text is the single gram); empty text yields
    zeros, never nulls/NaN — a filter predicate must not need null guards.
    """
    from ..operators.dedup import shingles

    t = F.coalesce(text, F.lit(""))
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    sorted_l = F.array_sort(lines)
    # a line is in a duplicate group iff it equals its sorted neighbor
    dup_flags = F.transform(
        sorted_l,
        lambda x, i: (
            # previous (1-based index i for 0-based position i-1; index 0 is
            # invalid under ANSI element_at, so guard the first element)
            F.when(i > 0, x.eqNullSafe(F.try_element_at(sorted_l, i))).otherwise(
                F.lit(False)
            )
            | x.eqNullSafe(F.try_element_at(sorted_l, i + 2))    # next
        ),
    )
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    dup_chars = F.aggregate(
        F.zip_with(sorted_l, dup_flags, lambda x, d: F.when(d, F.length(x)).otherwise(F.lit(0))),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    tlen = F.length(t)

    def ngram_frac(k):
        top = _top_run(F.array_sort(shingles(t, k)))
        return F.when(
            tlen > 0, F.round(top["cnt"] * F.length(top["gram"]) / tlen, 6)
        ).otherwise(F.lit(0.0))

    safe = lambda num, den: F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))  # noqa: E731
    return F.struct(
        n_lines.alias("n_lines"),
        safe((n_lines - F.size(F.array_distinct(lines))).cast("double"), n_lines).alias("dup_line_frac"),
        safe(dup_chars.cast("double"), line_chars).alias("dup_line_char_frac"),
        ngram_frac(2).alias("top2_char_frac"),
        ngram_frac(3).alias("top3_char_frac"),
        ngram_frac(4).alias("top4_char_frac"),
    )


#: stopword list for the Gopher "contains common words" rule
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2: float = 0.20,
    max_top3: float = 0.18,
    max_top4: float = 0.16,
) -> Column:
    """Gopher quality gate (Rae et al. 2021 §A1.1 rule family, thresholds
    as published / as the open reimplementations ship them) composed over
    :func:`repetition_signals` — struct(keep, reason) where ``reason``
    names the FIRST violated rule in a fixed order (word_count,
    mean_word_len, symbol_ratio, bullet_lines, ellipsis_lines,
    alpha_words, stopwords, dup_line_frac, dup_line_char_frac,
    top2/3/4_char_frac) and is null when the document passes. Pure
    Catalyst per-row logic — the corpus-scale keep/drop decision is a
    narrow map. The 5-10-gram duplicate-char rules of the paper are not
    implemented (documented subset)."""
    t = F.coalesce(text, F.lit(""))
    toks = tokens(t)
    n_words = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    mean_len = F.when(n_words > 0, total_len / n_words).otherwise(F.lit(0.0))
    n_symbols = F.size(F.regexp_extract_all(t, F.lit(r"(#|\.\.\.)"), 0))
    symbol_ratio = F.when(n_words > 0, n_symbols / n_words).otherwise(F.lit(0.0))
    lines = F.filter(F.split(t, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.size(lines)
    frac_lines = lambda pred: F.when(  # noqa: E731
        n_lines > 0, F.size(F.filter(lines, pred)) / n_lines
    ).otherwise(F.lit(0.0))
    bullet_frac = frac_lines(lambda x: F.trim(x).rlike(r"^([-*•])"))
    ellipsis_frac = frac_lines(lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    sig = repetition_signals(t)
    reason = (
        F.when((n_words < min_words) | (n_words > max_words), F.lit("word_count"))
        .when((mean_len < min_mean_word_len) | (mean_len > max_mean_word_len), F.lit("mean_word_len"))
        .when(symbol_ratio > max_symbol_ratio, F.lit("symbol_ratio"))
        .when(bullet_frac > max_bullet_frac, F.lit("bullet_lines"))
        .when(ellipsis_frac > max_ellipsis_frac, F.lit("ellipsis_lines"))
        .when(alpha_frac < min_alpha_frac, F.lit("alpha_words"))
        .when(n_stop < min_stopwords, F.lit("stopwords"))
        .when(sig["dup_line_frac"] > max_dup_line_frac, F.lit("dup_line_frac"))
        .when(sig["dup_line_char_frac"] > max_dup_line_char_frac, F.lit("dup_line_char_frac"))
        .when(sig["top2_char_frac"] > max_top2, F.lit("top2_char_frac"))
        .when(sig["top3_char_frac"] > max_top3, F.lit("top3_char_frac"))
        .when(sig["top4_char_frac"] > max_top4, F.lit("top4_char_frac"))
        .otherwise(F.lit(None).cast("string"))
    )
    return F.struct(reason.isNull().alias("keep"), reason.alias("reason"))
