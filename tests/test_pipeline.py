"""End-to-end pipeline vs golden triples — the P/R ≥ 0.95 gate
(BASELINE.json metric; FIXTURES.md §3)."""

import pytest
from pyspark.sql import functions as F

from kgcompass_spark.pipeline import build_kg, prepare_pages
from kgcompass_spark.sources.datagen import CUTOFF, corpus_dataframes


@pytest.fixture(scope="module")
def corpus(spark):
    pages, entities, goldens, golden_text = corpus_dataframes(spark, n_pages=200)
    return pages, entities, goldens, golden_text


def _pr(spark, got, want):
    got_set = {(r.subj, r.predicate, r.obj) for r in got.collect()}
    want_set = {(r.subj, r.predicate, r.obj) for r in want.collect()}
    tp = len(got_set & want_set)
    precision = tp / len(got_set) if got_set else 0.0
    recall = tp / len(want_set) if want_set else 0.0
    return precision, recall, got_set, want_set


def test_triple_precision_recall(spark, corpus):
    pages, entities, goldens, _ = corpus
    out = build_kg(pages, entities, cutoff=CUTOFF)
    triples = out["triples"].dropDuplicates(["subj", "predicate", "obj"])
    golden = goldens.dropDuplicates(["subj", "predicate", "obj"])
    p, r, got, want = _pr(spark, triples, golden)
    assert p >= 0.95, f"precision {p:.3f}; spurious: {sorted(got - want)[:10]}"
    assert r >= 0.95, f"recall {r:.3f}; missing: {sorted(want - got)[:10]}"


def test_weight_tiers_on_matched(spark, corpus):
    """FIXTURES §3: tier asserted on matched rows (ignore for matching)."""
    pages, entities, goldens, _ = corpus
    out = build_kg(pages, entities, cutoff=CUTOFF)
    joined = (
        out["triples"]
        .join(goldens.select("subj", "predicate", "obj",
                             F.col("weight").alias("gw")),
              ["subj", "predicate", "obj"])
    )
    bad = joined.filter(F.col("weight") != F.col("gw")).count()
    total = joined.count()
    assert total > 0
    assert bad / total <= 0.05, f"{bad}/{total} weight-tier mismatches"


def test_extracted_text_byte_identical(spark, corpus):
    """Per-row invariant: byte-identical extracted text per url."""
    pages, _, _, golden_text = corpus
    html_pages = pages.filter(F.col("text").isNull())
    prepared = prepare_pages(html_pages, cutoff=None)
    cmp = prepared.join(golden_text, "url").filter(
        F.col("clean_text") != F.trim(F.col("extracted_text"))
    )
    assert cmp.count() == 0


def test_leakage_filter(spark, corpus):
    """No triple sourced from a page with warc_ts > cutoff."""
    pages, entities, _, _ = corpus
    out = build_kg(pages, entities, cutoff=CUTOFF)
    late_urls = [
        r.url for r in pages.filter(F.col("warc_ts") > F.lit(CUTOFF)).collect()
    ]
    assert late_urls, "fixture should contain post-cutoff pages"
    leaked = out["triples"].filter(F.col("src_url").isin(late_urls)).count()
    assert leaked == 0


def test_duplicate_page_exactly_once(spark, corpus):
    """Same url crawled twice → triples identical to a single-crawl run."""
    pages, entities, _, _ = corpus
    once = pages.dropDuplicates(["url"])
    t_dup = build_kg(pages, entities, cutoff=CUTOFF)["triples"]
    t_once = build_kg(once, entities, cutoff=CUTOFF)["triples"]
    sym_diff = t_dup.select("subj", "predicate", "obj").exceptAll(
        t_once.select("subj", "predicate", "obj")
    ).union(
        t_once.select("subj", "predicate", "obj").exceptAll(
            t_dup.select("subj", "predicate", "obj")
        )
    )
    assert sym_diff.count() == 0


def test_determinism_two_runs(spark, corpus):
    """Two runs → identical output hash (SURVEY.md §5 invariant)."""
    pages, entities, _, _ = corpus

    def run_hash():
        t = build_kg(pages, entities, cutoff=CUTOFF)["triples"]
        return (
            t.select(F.sha2(F.concat_ws("|", "subj", "predicate", "obj",
                                        F.format_number("weight", 4)), 256).alias("h"))
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"))
            .first()["s"]
        )

    assert run_hash() == run_hash()


def test_reverse_edges_symmetric(spark, corpus):
    pages, entities, _, _ = corpus
    out = build_kg(pages, entities, cutoff=CUTOFF, include_reverse=True)
    t = out["triples"]
    fwd = t.filter(F.col("predicate") == "points to file").count()
    rev = t.filter(F.col("predicate") == "referenced by issue").count()
    assert fwd > 0 and rev >= fwd  # several forward predicates share the reverse
