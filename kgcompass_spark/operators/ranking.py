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
