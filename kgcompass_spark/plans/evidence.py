"""Evidence-graph ranked export (SURVEY.md §3.2) — the embedding-free,
fully deterministic ranking pipeline the reference ships as
export_kg_evidence_graph.py:

    root issue → 1..4-hop typed paths (bounded BFS over the symmetric
    edge closure; Directory nodes excluded everywhere, Method never the
    FIRST intermediate — the Cypher UNION's label patterns at :198-229)
    → targets restricted to Method | Class (:201, :207, ...)
    → target-only test-method exclusion with the pytest allowlist (:231-233)
    → per-target support over ALL shortest paths + anchor (length-1 path OR
      a File node on a shortest path matching the target's file) (:234-241)
    → best_path = lexicographically smallest shortest path by node sequence
      (:243-246), plus bounded path_details for path diversity
    → bounded candidate cap (TakeOrdered, knowledge_graph.py:1177)
    → T4 10-key rerank over the FULL capped set, per-type slice LAST
      (main(): _rerank_records(...) then methods[:limit]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SEARCH_SPACE, SIMILARITY_CANDIDATE_CAP
from ..operators.graph import seeded_support
from ..operators.ranking import (
    node_type_from_id,
    rank_evidence_full,
    rank_evidence_full_all,
)
from ..operators.triples import with_reverse_edges

def _export_order() -> list:
    """The Cypher's final ordering contract
    (export_kg_evidence_graph.py:269-273): support desc, distance asc,
    anchor desc, file_path asc, name asc (+ node id as a determinism
    guard). Lazy — Columns need an active SparkContext."""
    return [
        F.desc("support"),
        F.asc("distance"),
        F.desc("anchor"),
        F.asc(F.coalesce(F.col("file_path"), F.lit(""))),
        F.asc(F.coalesce(F.col("name"), F.lit(""))),
        F.asc("node"),
    ]


def _evidence_edges(triples: DataFrame) -> DataFrame:
    """Symmetric closure minus Directory hops — the Cypher's
    ``NONE(x IN nodes(p) WHERE x:Directory)`` (export_kg_evidence_graph.py
    :230). The test-method exclusion is TARGET-only (:231-233) and applied
    downstream, not here."""
    return with_reverse_edges(triples).filter(
        ~F.col("subj").startswith("directory:")
        & ~F.col("obj").startswith("directory:")
    )


def _typed_candidates(
    support: DataFrame, entities: DataFrame | None
) -> DataFrame:
    """Target filter + meta + anchor, shared by the single-root and batched
    exports. ``support`` is seeded_support output carrying a ``paths``
    column. Adds (entity_type, name, signature, file_path, start_line,
    anchor, best_path, path_details); restricts targets to method/class and
    applies the target-only test exclusion."""
    typed = support.withColumn(
        "entity_type", node_type_from_id(F.col("node"))
    ).filter(F.col("entity_type").isin("method", "class"))
    if entities is not None:
        meta = entities.select(
            F.col("entity_id").alias("node"),
            "name", "signature", "file_path", "start_line",
        )
        typed = typed.join(F.broadcast(meta), "node", "left")
    else:
        # entity ids are '<kind>:<name>@<file_path>' — recover the fields
        typed = (
            typed.withColumn(
                "name", F.regexp_extract(F.col("node"), r"^[a-z_]+:([^@]*)", 1)
            )
            .withColumn(
                "file_path",
                F.nullif(F.regexp_extract(F.col("node"), r"@(.*)$", 1), F.lit("")),
            )
            .withColumn("signature", F.lit(None).cast("string"))
            .withColumn("start_line", F.lit(None).cast("int"))
        )
    # target-only test exclusion with the pytest allowlist
    # (export_kg_evidence_graph.py:231-233; same rule as the similarity
    # plan's knowledge_graph.py:1073 — export uses toLower)
    name_low = F.lower(F.coalesce(F.col("name"), F.lit("")))
    typed = typed.filter(
        (F.col("entity_type") != "method")
        | ~name_low.contains("test")
        | name_low.contains("pytest")
    )
    # anchor_match (:241): any shortest path of length 1, OR any File node
    # on a (retained) shortest path whose path equals the target's file
    file_node = F.concat(F.lit("file:"), F.coalesce(F.col("file_path"), F.lit("\x00")))
    typed = typed.withColumn(
        "anchor",
        (F.col("distance") == 1)
        | F.exists(
            F.col("paths"),
            lambda p: F.exists(p, lambda x: x["node"] == file_node),
        ),
    )
    # best_path = lexicographically smallest shortest path by node sequence
    # (:243-246); path_details = the retained shortest paths, typed structs
    typed = typed.withColumn("best_path", F.element_at(F.col("paths"), 1))
    typed = typed.withColumn(
        "path_details",
        F.transform(
            F.col("paths"),
            lambda p: F.transform(
                p,
                lambda x: F.struct(
                    x["node"].alias("node"),
                    F.split(x["node"], ":", 2)[0].alias("entity_type"),
                    x["predicate"].alias("predicate"),
                ),
            ),
        ),
    ).drop("paths")
    return typed


def evidence_export(
    triples: DataFrame,
    root: str,
    max_hops: int = 4,
    cap: int = SEARCH_SPACE,
    entities: DataFrame | None = None,
    issue_text: str | None = None,
    path_k: int = 8,
    precap: int = SIMILARITY_CANDIDATE_CAP,
) -> DataFrame:
    """Ranked related-entity export for one root issue node.

    Returns (node, entity_type, name, file_path, distance, support, anchor,
    rank, type_rank, best_path, path_details[, n_exact, n_path_tok, n_tok,
    boilerplate]). Support counts DISTINCT first-hop seeds over ALL min-hop
    paths (seeded_support — the Cypher collects every shortest path; a
    single-best-path SSSP would degenerate support to 1). The candidate set
    is bounded with orderBy+limit ``precap`` (TakeOrdered — the reference's
    10,000 cap, knowledge_graph.py:1177) BEFORE any global rank window;
    when entities+issue_text are given the T4 10-key rerank runs over that
    FULL capped set and the per-type ``cap`` slice is applied LAST, with
    type_rank recomputed from the 10-key order (reference main()).
    """
    edges = _evidence_edges(triples)
    spark = triples.sparkSession
    roots = spark.createDataFrame([(root,)], "root string")
    support = (
        seeded_support(
            edges,
            roots,
            max_hops=max_hops,
            path_k=path_k,
            frontier_cap=precap,
            hop1_expand_excludes=("method",),
        )
        .drop("root")
        .filter(F.col("node") != root)
    )
    typed = _typed_candidates(support, entities)
    capped = typed.orderBy(*_export_order()).limit(precap)
    base_cols = [
        "node", "entity_type", "name", "file_path", "distance", "support",
        "anchor", "rank", "type_rank", "best_path", "path_details",
    ]
    if entities is not None and issue_text is not None:
        ranked = rank_evidence_full(capped, None, issue_text)
        wt = Window.partitionBy("entity_type").orderBy(F.asc("rank"))
        return (
            ranked.withColumn("type_rank", F.row_number().over(wt))
            .filter(F.col("type_rank") <= cap)
            .select(*base_cols, "n_exact", "n_path_tok", "n_tok", "boilerplate")
        )
    ranked = capped.withColumn(
        "rank", F.row_number().over(Window.orderBy(*_export_order()))
    )
    wt = Window.partitionBy("entity_type").orderBy(F.asc("rank"))
    return (
        ranked.withColumn("type_rank", F.row_number().over(wt))
        .filter(F.col("type_rank") <= cap)
        .select(*base_cols)
    )


def evidence_export_all(
    triples: DataFrame,
    roots: DataFrame,
    max_hops: int = 4,
    cap: int = SEARCH_SPACE,
    entities: DataFrame | None = None,
    issue_texts: DataFrame | None = None,
    path_k: int = 1,
    precap: int = SIMILARITY_CANDIDATE_CAP,
    edges_collapsed: bool = False,
) -> DataFrame:
    """Batched evidence export: the per-root ``evidence_export`` output for
    EVERY root in one job — true multi-path support via seeded_support,
    width-bounded best_path/path_details (default ``path_k=1`` carries just
    the best path per target; raise it for path diversity), and, when
    entities+issue_texts are given, the same T4 10-key rerank with per-root
    anchor terms (rank_evidence_full_all) so batched and per-root outputs
    agree including rank columns.

    Per-root candidate bounding is a row_number window partitioned by root
    (a TakeOrdered can't be per-root; root partitions distribute across
    executors, so no single global sort).
    """
    edges = _evidence_edges(triples)
    support = seeded_support(
        edges,
        roots,
        max_hops=max_hops,
        path_k=path_k,
        frontier_cap=precap,
        hop1_expand_excludes=("method",),
        # NOTE: the symmetric closure preserves pair-uniqueness, so a
        # caller whose TRIPLES have unique (subj, obj) may pass True and
        # skip the edge-collapse exchange (see seeded_support docstring)
        edges_collapsed=edges_collapsed,
    ).filter(F.col("node") != F.col("root"))
    typed = _typed_candidates(support, entities)
    wcap = Window.partitionBy("root").orderBy(*_export_order())
    # ONE per-root sort: the cap row_number over the export order IS the
    # rank after the filter (row_number of the surviving rows is unchanged
    # by dropping rows ranked below them) — recomputing it was a second
    # full sort+exchange of the candidate set
    capped = typed.withColumn("_cr", F.row_number().over(wcap)).filter(
        F.col("_cr") <= precap
    )
    base_cols = [
        "root", "node", "entity_type", "name", "file_path", "distance",
        "support", "anchor", "rank", "type_rank", "best_path", "path_details",
    ]
    if entities is not None and issue_texts is not None:
        ranked = rank_evidence_full_all(capped.drop("_cr"), None, issue_texts)
        wt = Window.partitionBy("root", "entity_type").orderBy(F.asc("rank"))
        return (
            ranked.withColumn("type_rank", F.row_number().over(wt))
            .filter(F.col("type_rank") <= cap)
            .select(*base_cols, "n_exact", "n_path_tok", "n_tok", "boilerplate")
        )
    ranked = capped.withColumnRenamed("_cr", "rank")
    wt = Window.partitionBy("root", "entity_type").orderBy(F.asc("rank"))
    return (
        ranked.withColumn("type_rank", F.row_number().over(wt))
        .filter(F.col("type_rank") <= cap)
        .select(*base_cols)
    )
