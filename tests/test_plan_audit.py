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
