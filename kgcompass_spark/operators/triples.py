"""Triple construction (SURVEY.md §2.6) — links → (subj, pred, obj) rows.

The KG edge table IS the triple table: (src, dst, predicate, weight,
provenance). Reverse edges are a select-swap union with the predicate
inversion map as a literal map_from_arrays lookup — the table the reference
hand-codes in Cypher (knowledge_graph.py:1120-1135).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PREDICATE_INVERSE, STRONG_CONNECTION

# target kind → forward predicate for issue-source links
_ISSUE_PREDICATE = {
    "file": "points to file",
    "method": "points to method",
    "class": "points to class",
    "global_var": "points to method",   # reference stores globals as Method nodes
    "issue": "points to issue",
    "commit": "points to commit",
}


def links_to_triples(links: DataFrame) -> DataFrame:
    """(url, entity_id, kind, weight) → triple rows with issue subject.

    Dedup on (subj, predicate, obj) keeps the *strongest* (min) weight —
    MERGE semantics of the reference store.
    """
    pred = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(_ISSUE_PREDICATE.items())]
    )
    return (
        links.select(
            F.concat(F.lit("issue:"), F.col("url")).alias("subj"),
            pred[F.col("kind")].alias("predicate"),
            F.col("entity_id").alias("obj"),
            F.col("weight").cast("double").alias("weight"),
            F.col("url").alias("src_url"),
        )
        .groupBy("subj", "predicate", "obj")
        .agg(F.min("weight").alias("weight"), F.min("src_url").alias("src_url"))
    )


def structural_triples(entities: DataFrame) -> DataFrame:
    """contains directory/file/class/method triples from the inventory."""
    dirs = (
        entities.filter((F.col("kind") == "directory") & F.col("file_path").contains("/"))
        .select(
            F.concat(F.lit("directory:"), F.regexp_replace("file_path", "/[^/]+$", "")).alias("subj"),
            F.lit("contains directory").alias("predicate"),
            F.col("entity_id").alias("obj"),
        )
    )
    files = entities.filter(F.col("kind") == "file").select(
        F.concat(F.lit("directory:"), F.regexp_replace("file_path", "/[^/]+$", "")).alias("subj"),
        F.lit("contains file").alias("predicate"),
        F.col("entity_id").alias("obj"),
    )
    classes = entities.filter(F.col("kind") == "class").select(
        F.concat(F.lit("file:"), F.col("file_path")).alias("subj"),
        F.lit("contains class").alias("predicate"),
        F.col("entity_id").alias("obj"),
    )
    # A method's container is its class — unless the name minus the last
    # segment is the *module* path (a top-level function), in which case the
    # container is the file (reference emits File-[contains method]->Method,
    # knowledge_graph.py:920-926; we use the distinct forward predicate
    # 'contains method in file' so the inverse map stays a function).
    from ..functions.cleaning import module_path

    parent = F.regexp_replace("name", r"\.[^.]+$", "")
    is_toplevel = parent == module_path(F.col("file_path"))
    methods = entities.filter(F.col("kind") == "method").select(
        F.when(is_toplevel, F.concat(F.lit("file:"), F.col("file_path")))
        .otherwise(
            F.concat(F.lit("class:"), parent, F.lit("@"), F.col("file_path"))
        )
        .alias("subj"),
        F.when(is_toplevel, F.lit("contains method in file"))
        .otherwise(F.lit("contains method"))
        .alias("predicate"),
        F.col("entity_id").alias("obj"),
    )
    return (
        dirs.unionByName(files).unionByName(classes).unionByName(methods)
        .withColumn("weight", F.lit(STRONG_CONNECTION))
        .withColumn("src_url", F.lit(""))
    )


def with_reverse_edges(triples: DataFrame) -> DataFrame:
    """Symmetric closure: union the swapped rows with inverted predicates."""
    inv = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(PREDICATE_INVERSE.items())]
    )
    reverse = triples.select(
        F.col("obj").alias("subj"),
        inv[F.col("predicate")].alias("predicate"),
        F.col("subj").alias("obj"),
        "weight",
        "src_url",
    )
    return triples.unionByName(reverse)
