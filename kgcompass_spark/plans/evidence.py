"""Evidence-graph ranked export (SURVEY.md §3.2) — the embedding-free,
fully deterministic ranking pipeline the reference ships as
export_kg_evidence_graph.py:

    root issue → 1..4-hop typed paths (bounded BFS over the symmetric
    edge closure, Directory nodes excluded, test methods excluded)
    → per-target support aggregation (A4/A5)
    → deterministic rank (T4) → per-type cap at SEARCH_SPACE (T7)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SEARCH_SPACE
from ..operators.graph import bounded_sssp, seeded_support
from ..operators.ranking import evidence_support, node_type_from_id, per_type_topk, rank_evidence
from ..operators.triples import with_reverse_edges


def _evidence_edges(triples: DataFrame) -> DataFrame:
    """Symmetric closure with the reference's path filters: no Directory
    hops, no test methods (export_kg_evidence_graph.py:230-233)."""
    return with_reverse_edges(triples).filter(
        ~F.col("subj").startswith("directory:")
        & ~F.col("obj").startswith("directory:")
        & ~F.col("obj").contains("test_")
    )


def evidence_export(
    triples: DataFrame,
    root: str,
    max_hops: int = 4,
    cap: int = SEARCH_SPACE,
    entities: DataFrame | None = None,
    issue_text: str | None = None,
) -> DataFrame:
    """Ranked related-entity export for one root issue node.

    Returns (node, entity_type, distance, support, rank, type_rank,
    best_path). Matches the reference's ordering contract: support desc,
    distance asc, anchor desc, node asc (export_kg_evidence_graph.py:269-273)
    with the per-type SEARCH_SPACE cap (345-346). Support counts DISTINCT
    first-hop seeds over ALL min-hop paths (seeded_support — the Cypher
    collects every shortest path; a single-best-path SSSP would degenerate
    support to 1); best_path comes from the single-path SSSP.
    """
    edges = _evidence_edges(triples)
    spark = triples.sparkSession
    roots = spark.createDataFrame([(root,)], "root string")
    support = (
        seeded_support(edges, roots, max_hops=max_hops)
        .drop("root")
        .filter(F.col("node") != root)
    )
    paths = bounded_sssp(edges, root, max_hops=max_hops)
    best_paths = paths.filter(F.size("path") > 0).select(
        "node", F.col("path").alias("best_path")
    )
    support = support.join(best_paths, "node", "left")
    # anchor = 1-hop targets (direct file/entity mentions of the root)
    anchors = paths.filter(F.col("hops") == 1).select(
        "node", F.lit(True).alias("anchor")
    )
    ranked = rank_evidence(support, anchors)
    typed = ranked.withColumn("entity_type", node_type_from_id(F.col("node")))
    out = per_type_topk(
        typed,
        type_col="entity_type",
        order_cols=[F.desc("support"), F.asc("distance"), F.desc("anchor"), F.asc("node")],
        k=cap,
    ).select(
        "node", "entity_type", "distance", "support", "anchor",
        "rank", "type_rank", "best_path",
    )
    if entities is not None and issue_text is not None:
        # final T4 10-component rerank over the capped export records —
        # the reference reranks the exported set with issue anchor terms
        # (export_kg_evidence_graph.py:163-194 _rerank_records)
        from ..operators.ranking import rank_evidence_full

        out = rank_evidence_full(out.drop("rank"), entities, issue_text).select(
            "node", "entity_type", "distance", "support", "anchor",
            "rank", "type_rank", "best_path",
            "n_exact", "n_path_tok", "n_tok", "boilerplate",
        )
    return out


def evidence_export_all(
    triples: DataFrame,
    roots: DataFrame,
    max_hops: int = 4,
    cap: int = SEARCH_SPACE,
) -> DataFrame:
    """Batched evidence export: (root, node, entity_type, distance,
    support, anchor, type_rank) for EVERY root in one job — true multi-path
    support via seeded_support; path structs are not carried (use
    evidence_export for per-root path details)."""
    edges = _evidence_edges(triples)
    support = seeded_support(edges, roots, max_hops=max_hops).filter(
        F.col("node") != F.col("root")
    )
    anchors = support.filter(F.col("distance") == 1).select(
        "root", "node", F.lit(True).alias("anchor")
    )
    df = support.join(anchors, ["root", "node"], "left").withColumn(
        "anchor", F.coalesce(F.col("anchor"), F.lit(False))
    )
    typed = df.withColumn("entity_type", node_type_from_id(F.col("node")))
    from pyspark.sql import Window

    w = Window.partitionBy("root", "entity_type").orderBy(
        F.desc("support"), F.asc("distance"), F.desc("anchor"), F.asc("node")
    )
    return (
        typed.withColumn("type_rank", F.row_number().over(w))
        .filter(F.col("type_rank") <= cap)
        .select("root", "node", "entity_type", "distance", "support", "anchor", "type_rank")
    )
