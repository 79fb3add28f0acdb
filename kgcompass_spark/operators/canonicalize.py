"""Entity canonicalization (SURVEY.md §1.3, §7.6; north_rule G8).

The reference enforces identity by MERGE-on-natural-key in Neo4j
(knowledge_graph.py:165-172: Method=(name, signature, file_path),
Class=(name, file_path), File=path), and records a real bug where two path
spellings split one entity (fl.py:391-414). At web scale the same guarantee
is an equivalence closure: connected components over the
entity ↔ natural-key bipartite graph, canonical id = min entity id per
component, triples rewritten through the mapping with broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import normalize_path
from .graph import connected_components


def natural_key(entities: DataFrame) -> DataFrame:
    """(entity_id, nat_key) — the reference's MERGE keys with normalized
    paths, so spelling variants of one entity share a key."""
    norm = normalize_path(F.col("file_path"))
    key = F.concat_ws(
        "§",
        F.col("kind"),
        F.when(F.col("kind").isin("file", "directory"), norm).otherwise(
            F.concat_ws("@", F.col("name"), norm)
        ),
    )
    return entities.select("entity_id", key.alias("nat_key"))


def canonical_mapping(entities: DataFrame) -> DataFrame:
    """(entity_id, canonical_id) via CC over the entity↔key bipartite graph.

    Single-spelling entities map to themselves. The CC runs delta-frontier
    min-label propagation with double pointer jumping (a few shuffles per
    round, O(log n) rounds on path-shaped graphs) — the scale path for
    10^9-entity inventories; at small scale it converges in 1-2 rounds.
    """
    nk = natural_key(entities)
    edges = nk.select(
        F.col("entity_id").alias("src"),
        F.concat(F.lit("KEY::"), F.col("nat_key")).alias("dst"),
    )
    cc = connected_components(edges)
    ent_cc = cc.filter(~F.col("node").startswith("KEY::"))
    # canonical id = min *entity* id in the component (components may be
    # labeled by a KEY:: node when it sorts lowest, so re-minimize over
    # entity members only)
    canon = ent_cc.groupBy("component").agg(F.min("node").alias("canonical_id"))
    return (
        ent_cc.join(canon, "component")
        .select(F.col("node").alias("entity_id"), "canonical_id")
    )


def canonicalize_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical mapping (two broadcast joins;
    ids not in the mapping — issues, keys — pass through), then re-dedup
    keeping the strongest weight (MERGE semantics)."""
    m = F.broadcast(mapping)
    out = (
        triples.join(
            m.withColumnRenamed("entity_id", "subj").withColumnRenamed("canonical_id", "_csubj"),
            "subj",
            "left",
        )
        .join(
            m.withColumnRenamed("entity_id", "obj").withColumnRenamed("canonical_id", "_cobj"),
            "obj",
            "left",
        )
        .select(
            F.coalesce(F.col("_csubj"), F.col("subj")).alias("subj"),
            "predicate",
            F.coalesce(F.col("_cobj"), F.col("obj")).alias("obj"),
            "weight",
            "src_url",
        )
    )
    return (
        out.groupBy("subj", "predicate", "obj")
        .agg(F.min("weight").alias("weight"), F.min("src_url").alias("src_url"))
    )
