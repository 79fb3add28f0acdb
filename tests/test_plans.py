"""Physical-plan audits (SURVEY.md §4) — the properties that decide 100-TB
behavior, asserted on the optimized plans:

  - filter + column pruning reach the parquet scan (PushedFilters/ReadSchema)
  - every linking resolver is a broadcast hash join (pages side never shuffles)
  - the mention battery stays inside WholeStageCodegen
  - aggregates get map-side partial aggregation (HashAggregate x2)
"""

import os

import pytest
from pyspark.sql import functions as F

from kgcompass_spark.pipeline import build_kg
from kgcompass_spark.sources.datagen import corpus_dataframes

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_parquet_filter_pushdown(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must read only the 3 referenced columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1][:200]


def test_linking_joins_are_broadcast(spark):
    pages, entities, _, _ = corpus_dataframes(spark, n_pages=20)
    out = build_kg(pages, entities)
    plan = plan_of(out["links"])
    # the fused alias-dictionary resolver and the traceback resolver must
    # broadcast the dictionary (the file/qualified/call resolvers are ONE
    # tagged-key broadcast join — one pass over the mentions table)
    assert plan.count("BroadcastHashJoin") >= 2
    # the only shuffle join allowed is the issue-ref SELF-join (both sides
    # are page-derived and big at scale — sort-merge is the correct plan)
    smj_lines = [l for l in plan.splitlines() if "SortMergeJoin" in l]
    assert len(smj_lines) <= 1
    assert all("_ref" in l and "_key" in l for l in smj_lines), smj_lines


def test_mention_battery_single_shuffle(spark):
    """The whole page→mention path must be ONE narrow pipeline after the
    url-dedup shuffle: scan → agg → UDF → regex projections → explode.
    (WholeStageCodegen is not asserted: higher-order array functions are
    interpreted expressions inside the projection by design — still
    JVM-side, still a single pass.)"""
    pages, entities, _, _ = corpus_dataframes(spark, n_pages=20)
    out = build_kg(pages, entities)
    plan = plan_of(out["mentions"])
    assert plan.count("Exchange") <= 1, plan[:500]
    assert "Generate explode" in plan


def test_triple_dedup_partial_agg(spark):
    pages, entities, _, _ = corpus_dataframes(spark, n_pages=20)
    out = build_kg(pages, entities)
    plan = plan_of(out["triples"])
    # partial + final aggregation around the exchange (min(struct) buffers
    # use SortAggregate — partial_min before the shuffle is the property)
    assert "partial_min" in plan or "partial min" in plan
    agg_nodes = [l for l in plan.splitlines() if "Aggregate" in l]
    assert len(agg_nodes) >= 2


def test_a6_aggregate_pushdown_shape(spark):
    import __spark_entry__ as E

    q = E.queries()["a6_pricing_summary"](spark, "/root/testdata/sf0.001")
    plan = plan_of(q)
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert plan.count("HashAggregate") >= 2  # map-side combine


def test_no_cartesian_anywhere_in_pipeline(spark):
    pages, entities, _, _ = corpus_dataframes(spark, n_pages=20)
    out = build_kg(pages, entities, include_reverse=True)
    for name in ("links", "triples"):
        assert "CartesianProduct" not in plan_of(out[name]), name


def test_ivf_topk_no_global_window(spark):
    """Centroid selection must be a TakeOrdered (per-partition top-n), not a
    single-partition Window over the full embedding table — the round-1
    scale-killer. Also: no count() action during planning (plan builds
    without executing jobs)."""
    from kgcompass_spark.operators.simsearch import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.limit(1).select(
        F.lit(0).cast("long").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = plan_of(ivf_topk(emb, q, k=5, n_cells=4, n_probe=2))
    assert "TakeOrderedAndProject" in plan
    # any Window must sit above a LocalLimit (the n_cells rows), never
    # directly over the full scan in a single partition
    window_lines = [l for l in plan.splitlines() if "Window" in l and "cell" in l]
    for line in window_lines:
        assert "row_number" in line  # the bounded post-limit cell numbering
    assert "CartesianProduct" not in plan


def test_context_stages_broadcast_only(spark):
    """The context joins must broadcast the artifact side — the issue/page
    side must never shuffle for a join (only for its own aggregates).
    The ONE sanctioned nested-loop join is the array-intersect scoring
    cross-join: its build side is the ~|artifacts| token-array table,
    broadcast by construction, and every row it emits is a (page,
    artifact) score — bounded, not cartesian-by-accident."""
    from kgcompass_spark.sources.datagen import (
        CUTOFF,
        context_corpus_dataframes,
    )

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=20)
    commits, docs, _ = context_corpus_dataframes(spark, n_pages=20)
    out = build_kg(pages, entities, cutoff=CUTOFF, commits=commits, docs=docs)
    plan = plan_of(out["triples"])
    assert "CartesianProduct" not in plan
    # the scoring BNLJ always builds (broadcasts) its right side; textual
    # occurrences repeat once per persisted-subtree consumer branch, so
    # assert the SHAPE of every occurrence, not the count — a join that
    # degenerated to an unbroadcast nested loop would not carry BuildRight
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    assert n_bnlj >= 1  # the scoring pass is present
    assert n_bnlj == plan.count("BroadcastNestedLoopJoin BuildRight")
    assert plan.count("BroadcastHashJoin") >= 6  # selection/meta joins
