"""J2 fuzzy file search (plain + salted), J4 name-search fallback, and the
FIXTURES §6 hot-token skew corpus."""

import pytest
from pyspark.sql import functions as F

from kgcompass_spark.operators.linking import (
    fuzzy_file_search,
    name_search_fallback,
    span_containment_join,
)
from kgcompass_spark.sources.datagen import corpus_dataframes


@pytest.fixture(scope="module")
def entities(spark):
    _, ents, _, _ = corpus_dataframes(spark, n_pages=1)
    return ents


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "url string, mtype string, text string")


def test_fuzzy_file_search_partial_path(spark, entities):
    # mis-remembered path: right stem, wrong directory → fuzzy still finds it
    m = _mentions(spark, [("u1", "file", "wrongdir/parser.py")])
    out = fuzzy_file_search(m, entities).orderBy("rank").collect()
    assert out, "fuzzy search found nothing"
    assert out[0]["rank"] == 1
    assert out[0]["entity_id"].endswith("parser.py")
    assert all(r["rank"] <= 3 for r in out)


def test_fuzzy_file_search_salted_same_result(spark, entities):
    """Salting changes the physical join, never the result."""
    m = _mentions(
        spark,
        [("u%d" % i, "file", "wrongdir/parser.py") for i in range(50)]
        + [("u999", "file", "alphacore/engine/renderer.py")],
    )
    plain = {(r["url"], r["entity_id"], r["rank"]) for r in fuzzy_file_search(m, entities).collect()}
    salted = {(r["url"], r["entity_id"], r["rank"]) for r in fuzzy_file_search(m, entities, salt=8).collect()}
    assert plain == salted


def test_name_search_fallback_weak_links(spark, entities):
    m = _mentions(spark, [("u1", "call", "run_cycle")])
    out = name_search_fallback(m, entities).collect()
    assert out
    assert all(r["weight"] == 1.0 for r in out)  # WEAK tier
    assert all(r["kind"] == "method" for r in out)
    assert len(out) <= 20  # NAME_SEARCH_CAP


def test_hot_token_corpus_deterministic(spark, entities):
    """Hundreds of mentions of one identifier (FIXTURES §6 hot-token set):
    the skew path must stay deterministic and produce one winner per page."""
    rows = [(f"https://x.org/{i}", "call", "Parser") for i in range(300)]
    from kgcompass_spark.operators.linking import link_call_mentions

    m = _mentions(spark, rows)
    out = link_call_mentions(m, entities).collect()
    assert len(out) == 300
    winners = {r["entity_id"] for r in out}
    assert len(winners) == 1  # same deterministic winner everywhere


def test_span_containment(spark, entities):
    spans = spark.createDataFrame(
        [("alphacore/engine/parser.py", 16, 18)],
        "file_path string, hunk_start int, hunk_end int",
    )
    out = span_containment_join(spans, entities).collect()
    kinds = {r["kind"] for r in out}
    assert "class" in kinds   # class spans 10..100
    assert any(r["kind"] == "method" for r in out)


def test_lsh_alias_link_finds_corrupted_alias(spark):
    """MinHash-LSH blocking against a broadcast alias dictionary recovers
    the right entity for a surface-corrupted mention, ranks by exact
    n-gram Jaccard, and the salted non-broadcast path is result-identical
    to the broadcast path."""
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.linking import lsh_alias_link

    aliases = spark.createDataFrame(
        [
            (1, "connection_pool_manager"),
            (2, "connection pool handler"),
            (3, "unrelated thing entirely"),
            (4, "zzzz"),
        ],
        "entity_id long, alias string",
    )
    mentions = spark.createDataFrame(
        [("u1", "ConnectionPoolManager"), ("u2", "no such name qq")],
        "url string, text string",
    )
    out = lsh_alias_link(mentions, aliases, hash_fn=md5_60)
    rows = {(r["url"], r["rank"]): r for r in out.collect()}
    assert rows[("u1", 1)]["entity_id"] == 1
    # jaccard is the exact distinct-3-gram ratio, not an LSH estimate
    # ("connectionpoolmanager" vs "connection pool manager": the grams
    # spanning the underscores-made-spaces differ → 0.6, not ~1.0)
    assert rows[("u1", 1)]["jaccard"] > 0.5
    # entity 3/4 never block with u1
    assert all(r["entity_id"] in (1, 2) for (u, _), r in rows.items() if u == "u1")

    salted = lsh_alias_link(
        mentions, aliases, hash_fn=md5_60, broadcast_dict=False, salt=4
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, salted.collect()))


def test_lsh_alias_link_broadcast_plan(spark):
    """The blocking join against the banded dictionary must be a broadcast
    hash join — the mention side never shuffles for candidate generation."""
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.linking import lsh_alias_link

    aliases = spark.createDataFrame(
        [(1, "alpha beta gamma")], "entity_id long, alias string"
    )
    mentions = spark.createDataFrame(
        [("u1", "alpha beta gamma")], "url string, text string"
    )
    plan = (
        lsh_alias_link(mentions, aliases, hash_fn=md5_60)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
