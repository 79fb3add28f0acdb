"""Bucketed canonical graph tables — the north_rule's "entity and edge
tables partitioned by entity-hash bucket", as Spark NATIVE bucketed tables.

The StageCatalog (catalog.py) hash-clusters snapshot FILES, which co-locates
data but loses the layout at read time: Catalyst re-shuffles every
downstream join. A ``bucketBy`` table records the bucketing in the catalog,
so a join or aggregation keyed on the bucket column reads back WITHOUT an
Exchange — at 10^12 documents the edge table's self-joins (BFS expansion,
connected components, pagerank) are the dominant shuffles, and pre-bucketing
both graph tables on the entity key deletes them entirely. On an Iceberg
cluster the same declaration is ``PARTITIONED BY (bucket(N, subj))``; the
parquet+catalog form here is the sandbox equivalent (same contract:
layout-by-hash recorded in table metadata, exploited by the planner).

The shuffle-free read-back contract is pinned by tests/test_plan_audit.py
(join of two co-bucketed tables plans zero ShuffleExchange nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a parquet table bucketed (and sorted) on
    ``bucket_col``. ``path`` pins the storage location (external table);
    sorting within buckets lets the bucketed sort-merge join skip its sort.
    """
    sort_by = sort_cols or (bucket_col,)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_by)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def materialize_graph_tables(
    spark: SparkSession,
    triples: DataFrame,
    base_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    prefix: str = "kg",
) -> dict:
    """Write the canonical KG as two co-bucketed tables:

    ``<prefix>_edges`` (subj, predicate, obj, weight, src_url) bucketed by
    subj, and ``<prefix>_nodes`` (node, node_type, out_degree, in_degree)
    bucketed by node — node_type parsed from the ``type:`` id prefix the
    pipeline stamps on every entity id. Both use the same bucket count, so
    edges⋈nodes on the entity key and edges⋈edges (hop expansion) are
    exchange-free. Returns the two table names and read-back handles.
    """
    import os

    edges_tbl, nodes_tbl = f"{prefix}_edges", f"{prefix}_nodes"
    write_bucketed_table(
        triples.select("subj", "predicate", "obj", "weight", "src_url"),
        edges_tbl,
        "subj",
        n_buckets,
        path=os.path.join(base_path, edges_tbl),
        sort_cols=("subj", "predicate", "obj"),
    )
    out_deg = triples.groupBy(F.col("subj").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    in_deg = triples.groupBy(F.col("obj").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    nodes = (
        out_deg.join(in_deg, "node", "full_outer")
        .select(
            "node",
            F.regexp_extract("node", r"^([a-z_]+):", 1).alias("node_type"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
    write_bucketed_table(
        nodes,
        nodes_tbl,
        "node",
        n_buckets,
        path=os.path.join(base_path, nodes_tbl),
    )
    return {
        "edges_table": edges_tbl,
        "nodes_table": nodes_tbl,
        "edges": spark.table(edges_tbl),
        "nodes": spark.table(nodes_tbl),
    }
