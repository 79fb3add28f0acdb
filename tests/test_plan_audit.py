"""Physical/logical plan audits — pins for the 100-TB scale contracts.

These assert plan SHAPE, not results: the properties that made round-1/2
scale-killers (a partition-less Window over an uncapped input sorts the
world in one task; a SortMergeJoin against the broadcast-sized entity
inventory shuffles the pages table) must not silently regress.
"""

from pyspark.sql import functions as F

from kgcompass_spark.pipeline import build_kg
from kgcompass_spark.sources.datagen import CUTOFF, corpus_dataframes


def _logical_nodes(df):
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        yield node
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def _subtree(node):
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        children = n.children()
        for i in range(children.size()):
            stack.append(children.apply(i))


def test_evidence_export_has_no_uncapped_global_window(spark):
    """Round-2 verdict scale-killer #1: rank_evidence ran a partition-less
    Window BEFORE any cap. Contract now: every partition-less Window in the
    export plan must sit above a Limit (the TakeOrdered precap,
    knowledge_graph.py:1177's 10,000-candidate bound)."""
    from kgcompass_spark.plans.evidence import evidence_export

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=30)
    out = build_kg(pages, entities, cutoff=CUTOFF)
    root = "issue:" + pages.select("url").orderBy("url").first()["url"]
    export = evidence_export(out["triples"], root, entities=entities,
                             issue_text="crash in module pipeline")
    uncapped = []
    for node in _logical_nodes(export):
        if node.getClass().getSimpleName() != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        capped = any(
            d.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit", "Limit")
            for d in _subtree(node)
        )
        if not capped:
            uncapped.append(node.toString().splitlines()[0])
    assert not uncapped, f"partition-less Window over uncapped input: {uncapped}"


def test_ranked_related_has_no_uncapped_global_window(spark):
    """Same contract for the similarity-ranking plan (plans/related.py
    applies the SIMILARITY_CANDIDATE_CAP TakeOrdered before its global
    rank window)."""
    from kgcompass_spark.plans.related import ranked_related_entities

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=30)
    out = build_kg(pages, entities, cutoff=CUTOFF)
    root_url = pages.select("url").orderBy("url").first()["url"]
    ranked = ranked_related_entities(
        out["triples"], entities, root_url, "crash in module pipeline"
    )
    for node in _logical_nodes(ranked):
        if node.getClass().getSimpleName() != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        assert any(
            d.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit", "Limit")
            for d in _subtree(node)
        ), f"partition-less Window over uncapped input: {node.toString().splitlines()[0]}"


def test_link_battery_joins_are_broadcast(spark):
    """The verify-recipe contract as a test: every resolver join against
    the (small) entity inventory must plan as a broadcast join — a
    SortMergeJoin there means the 100-TB pages side gets shuffled on a
    dimension-table join. The ONE allowed shuffle join is the J8
    issue-cross-ref SELF-join (pages × pages on the `_ref`/`_key` doc
    ordinals) — fact-to-fact, deliberately not broadcast, AQE-skew-handled
    (SURVEY §4.1 shuffle inventory)."""
    pages, entities, _, _ = corpus_dataframes(spark, n_pages=30)
    out = build_kg(pages, entities, cutoff=CUTOFF)
    plan = out["links"]._jdf.queryExecution().sparkPlan().toString()
    smj = [
        ln.strip() for ln in plan.splitlines() if "SortMergeJoin" in ln
    ]
    offenders = [ln for ln in smj if "_ref" not in ln]
    assert not offenders, offenders


def test_bucketed_graph_tables_join_without_exchange(spark, tmp_path):
    """The canonical edge/node tables are bucketed on the entity key, so
    read-back joins and aggregations on that key plan ZERO shuffles — the
    scale contract the bucketed sink exists for (sources/bucketed.py)."""
    from pyspark.sql import functions as F

    from kgcompass_spark.sources.bucketed import materialize_graph_tables

    triples = spark.createDataFrame(
        [
            ("class:A", "contains method", "method:A.f", 0.25, "u1"),
            ("class:A", "contains method", "method:A.g", 0.25, "u1"),
            ("file:x.py", "contains class", "class:A", 0.25, "u2"),
            ("issue:u9", "points to file", "file:x.py", 1.0, "u9"),
        ],
        "subj string, predicate string, obj string, weight double, src_url string",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = materialize_graph_tables(
            spark, triples, str(tmp_path), n_buckets=4, prefix="t_bkt"
        )
        edges, nodes = out["edges"], out["nodes"]

        # content round-trips
        assert edges.count() == 4
        got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in nodes.collect()}
        assert got["class:A"] == (2, 1)
        assert got["method:A.f"] == (0, 1)
        assert {r["node_type"] for r in nodes.collect()} == {
            "class", "method", "file", "issue",
        }

        # edges ⋈ nodes on the bucket key: no Exchange anywhere in the plan
        j = edges.join(nodes, edges.subj == nodes.node)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        # hop expansion (edges self-join obj = subj) still needs one side
        # re-keyed — but groupBy on the bucket key is exchange-free
        agg = edges.groupBy("subj").agg(F.sum("weight"))
        aplan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in aplan, aplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bkt_edges")
        spark.sql("DROP TABLE IF EXISTS t_bkt_nodes")
