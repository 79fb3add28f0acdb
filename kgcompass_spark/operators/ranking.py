"""Ranking & export operators (SURVEY.md §2.7–2.8, §3.2).

  A4/A5 evidence support aggregation + best-path selection
        (export_kg_evidence_graph.py:234-246)
  T2    per-type ranked truncation (knowledge_graph.py:1266-1273)
  T4    lexicographic rerank (export_kg_evidence_graph.py:163-194)
  T7    final export split + cap at SEARCH_SPACE

The evidence-graph mode is embedding-free and fully deterministic
(kg_params.uses_embeddings = False in the reference export) — every window
carries a complete lexicographic tie-break key (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SEARCH_SPACE


def evidence_support(paths: DataFrame) -> DataFrame:
    """A4: group root→target paths by target.

    ``paths``: (node, cost, hops, path) from bounded_sssp, where
    path[0].node is the first-hop seed. Emits per target:
    min distance, support (= distinct first-hop seeds), best path (A5:
    lexicographically smallest among min-hop paths).
    """
    enriched = paths.filter(F.size("path") > 0).select(
        "node",
        "cost",
        "hops",
        "path",
        F.element_at(F.col("path"), 1)["node"].alias("seed"),
        F.col("path").cast("string").alias("path_key"),
    )
    agg = enriched.groupBy("node").agg(
        F.min("hops").alias("distance"),
        F.min("cost").alias("min_cost"),
        F.countDistinct("seed").alias("support"),
    )
    w = Window.partitionBy("node").orderBy(F.asc("hops"), F.asc("path_key"))
    best = (
        enriched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("node", F.col("path").alias("best_path"))
    )
    return agg.join(best, "node")


def rank_evidence(
    support: DataFrame,
    anchors: DataFrame | None = None,
) -> DataFrame:
    """T4-style deterministic ordering: support desc, distance asc,
    anchor desc, node asc (export_kg_evidence_graph.py:269-273).

    ``anchors``: optional (node, anchor boolean) — e.g. 1-hop file matches.
    """
    df = support
    if anchors is not None:
        df = df.join(anchors, "node", "left").withColumn(
            "anchor", F.coalesce(F.col("anchor"), F.lit(False))
        )
    else:
        df = df.withColumn("anchor", F.lit(False))
    return df.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(
                F.desc("support"),
                F.asc("distance"),
                F.desc("anchor"),
                F.asc("node"),
            )
        ),
    )


# Export-rerank stopwords (export_kg_evidence_graph.py:40-80 _STOPWORDS)
RERANK_STOPWORDS = frozenset({
    "about", "after", "again", "against", "also", "because", "before",
    "between", "cannot", "could", "does", "doesn", "during", "error",
    "expected", "from", "have", "into", "issue", "model", "models",
    "nested", "only", "problem", "return", "should", "that", "their",
    "there", "these", "this", "through", "when", "where", "while", "with",
    "would",
})

_DOTTED_IDENT = r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*"
_BACKTICK_SPAN = r"`([^`]+)`"


def _split_identifier_py(value: str) -> list[str]:
    """Python mirror of export_kg_evidence_graph.py:82-91 (driver-side —
    runs once on the single root-issue string)."""
    import re

    spaced = re.sub(r"([a-z0-9])([A-Z])", r"\1 \2", str(value or ""))
    return [
        t.lower()
        for t in re.split(r"[^A-Za-z0-9]+", spaced)
        if len(t) >= 3 and t.lower() not in RERANK_STOPWORDS
    ]


def issue_anchor_terms(issue_text: str) -> tuple[list[str], list[str]]:
    """export_kg_evidence_graph.py:94-116 ``_issue_anchor_terms``: exact
    terms = backticked identifiers (+ dot parts) and snake/camel tokens;
    lexical terms = identifier-split tokens. Driver-side: the root issue is
    ONE row — the term lists broadcast as literals into the ranking plan."""
    import re

    exact: set[str] = set()
    for span in re.findall(_BACKTICK_SPAN, issue_text or ""):
        for tok in re.findall(_DOTTED_IDENT, span):
            low = tok.lower()
            if len(low) >= 3:
                exact.add(low)
                exact.update(p for p in low.split(".") if len(p) >= 3)
    for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", issue_text or ""):
        if "_" in tok or re.search(r"[a-z][A-Z]", tok):
            low = tok.lower()
            if len(low) >= 3 and low not in RERANK_STOPWORDS:
                exact.add(low)
    lexical: set[str] = set()
    for tok in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", issue_text or ""):
        lexical.update(_split_identifier_py(tok))
    lexical -= RERANK_STOPWORDS
    return sorted(exact), sorted(lexical)


def _candidate_exact_terms(*cols) -> F.Column:
    """Dotted identifiers (≥3 chars, lowercased) + their dot parts from the
    candidate fields — Catalyst restatement of
    export_kg_evidence_graph.py:134-147 ``_candidate_identifier_terms``.

    Deviation, documented: the reference additionally word-boundary-greps
    each issue term in the joined field text; tokenizing the fields with
    the same identifier alphabet covers those matches except terms spanning
    punctuation inside a larger dotted token (rare; fixture-verified)."""
    text = F.lower(F.concat_ws("\n", *cols))
    toks = F.regexp_extract_all(text, F.lit(_DOTTED_IDENT), 0)
    parts = F.flatten(F.transform(toks, lambda t: F.split(t, r"\.")))
    return F.array_distinct(
        F.filter(F.concat(toks, parts), lambda t: F.length(t) >= 3)
    )


def _candidate_lexical_terms(*cols) -> F.Column:
    from ..functions.cleaning import split_identifier

    stop = F.array(*[F.lit(s) for s in sorted(RERANK_STOPWORDS)])
    return F.array_except(
        F.array_distinct(split_identifier(F.concat_ws(" ", *cols))), stop
    )


def _is_boilerplate(name: F.Column, file_path: F.Column) -> F.Column:
    """export_kg_evidence_graph.py:151-161 ``_is_boilerplate_candidate``."""
    base = F.element_at(F.split(F.coalesce(name, F.lit("")), r"\."), -1)
    return (
        F.coalesce(file_path, F.lit("")).endswith("/__init__.py")
        | (F.coalesce(file_path, F.lit("")) == "__init__.py")
        | base.isin("__all__", "__version__", "__doc__", "__bibtex__", "__citation__")
        | (base.startswith("__") & base.endswith("__"))
    )


def rank_evidence_full(
    support: DataFrame,
    entities: DataFrame,
    issue_text: str,
) -> DataFrame:
    """T4 FULL 10-component lexicographic rerank
    (export_kg_evidence_graph.py:163-194 ``_rerank_records``):

      1. exact-anchor matches desc   (issue exact terms ∩ candidate terms)
      2. path-token matches desc     (issue lexical ∩ file-path tokens)
      3. token matches desc          (issue lexical ∩ candidate lexical)
      4. support desc
      5. distance asc
      6. anchor desc
      7. boilerplate asc (non-boilerplate first)
      8. file_path asc   9. start_line asc   10. name asc

    ``support``: (node, distance, support[, anchor]) from evidence_support;
    ``entities``: inventory giving (entity_id, name, signature, file_path,
    start_line). All counting is JVM-side array intersections against the
    issue-term literals."""
    exact_terms, lexical_terms = issue_anchor_terms(issue_text)
    exact_lit = F.array(*[F.lit(t) for t in exact_terms]) if exact_terms else F.array().cast("array<string>")
    lex_lit = F.array(*[F.lit(t) for t in lexical_terms]) if lexical_terms else F.array().cast("array<string>")

    meta = entities.select(
        F.col("entity_id").alias("node"),
        "name", "signature", "file_path", "start_line",
    )
    df = support.join(F.broadcast(meta), "node", "left")
    if "anchor" not in df.columns:
        df = df.withColumn("anchor", F.lit(False))
    best_path_text = (
        F.col("best_path").cast("string") if "best_path" in df.columns else F.lit("")
    )
    cand_fields = [
        F.coalesce(F.col("name"), F.lit("")),
        F.coalesce(F.col("signature"), F.lit("")),
        F.coalesce(F.col("file_path"), F.lit("")),
        best_path_text,
    ]
    from ..functions.cleaning import split_identifier

    df = (
        df.withColumn(
            "n_exact", F.size(F.array_intersect(exact_lit, _candidate_exact_terms(*cand_fields)))
        )
        .withColumn(
            "n_path_tok",
            F.size(F.array_intersect(lex_lit, F.array_distinct(split_identifier(F.coalesce(F.col("file_path"), F.lit("")))))),
        )
        .withColumn(
            "n_tok", F.size(F.array_intersect(lex_lit, _candidate_lexical_terms(*cand_fields)))
        )
        .withColumn("boilerplate", _is_boilerplate(F.col("name"), F.col("file_path")))
    )
    # global window is intentional: this ranks the FINAL export candidate
    # set (≤ SEARCH_SPACE per type, knowledge_graph.py:1177 cap) — bounded
    # rows, not the full KG
    w = Window.orderBy(
        F.desc("n_exact"),
        F.desc("n_path_tok"),
        F.desc("n_tok"),
        F.desc("support"),
        F.asc("distance"),
        F.desc("anchor"),
        F.asc("boilerplate"),
        F.asc(F.coalesce(F.col("file_path"), F.lit(""))),
        F.asc(F.coalesce(F.col("start_line"), F.lit(0))),
        F.asc(F.coalesce(F.col("name"), F.lit(""))),
    )
    return df.withColumn("rank", F.row_number().over(w))


def per_type_topk(
    ranked: DataFrame,
    type_col: str = "entity_type",
    order_cols: list | None = None,
    k: int = SEARCH_SPACE,
) -> DataFrame:
    """T2/T7: per-type ranked truncation — row_number ≤ k within each
    entity type, full deterministic key."""
    order_cols = order_cols or [F.desc("support"), F.asc("distance"), F.asc("node")]
    w = Window.partitionBy(type_col).orderBy(*order_cols)
    return (
        ranked.withColumn("type_rank", F.row_number().over(w))
        .filter(F.col("type_rank") <= k)
    )


def node_type_from_id(node: F.Column) -> F.Column:
    """Entity ids are '<kind>:<rest>' — recover the kind for T7 splits."""
    return F.split(node, ":", 2)[0]
