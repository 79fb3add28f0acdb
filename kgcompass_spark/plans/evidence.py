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
from ..operators.graph import bounded_sssp
from ..operators.ranking import evidence_support, node_type_from_id, per_type_topk, rank_evidence
from ..operators.triples import with_reverse_edges


def evidence_export(
    triples: DataFrame,
    root: str,
    max_hops: int = 4,
    cap: int = SEARCH_SPACE,
) -> DataFrame:
    """Ranked related-entity export for one root issue node.

    Returns (node, entity_type, distance, support, rank, type_rank,
    best_path). Matches the reference's ordering contract: support desc,
    distance asc, anchor desc, node asc (export_kg_evidence_graph.py:269-273)
    with the per-type SEARCH_SPACE cap (345-346).
    """
    # symmetric closure; path filters mirror the reference:
    # no Directory hops, no test methods (export_kg_evidence_graph.py:230-233)
    edges = with_reverse_edges(triples).filter(
        ~F.col("subj").startswith("directory:")
        & ~F.col("obj").startswith("directory:")
        & ~F.col("obj").contains("test_")
    )
    paths = bounded_sssp(edges, root, max_hops=max_hops)
    support = evidence_support(paths).filter(F.col("node") != root)
    # anchor = 1-hop targets (direct file/entity mentions of the root)
    anchors = paths.filter(F.col("hops") == 1).select(
        "node", F.lit(True).alias("anchor")
    )
    ranked = rank_evidence(support, anchors)
    typed = ranked.withColumn("entity_type", node_type_from_id(F.col("node")))
    return per_type_topk(
        typed,
        type_col="entity_type",
        order_cols=[F.desc("support"), F.asc("distance"), F.desc("anchor"), F.asc("node")],
        k=cap,
    ).select(
        "node", "entity_type", "distance", "support", "anchor",
        "rank", "type_rank", "best_path",
    )
