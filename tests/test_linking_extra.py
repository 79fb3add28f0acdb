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
