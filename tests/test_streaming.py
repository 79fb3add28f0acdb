"""Structured Streaming ingest: file-source pages → windowed mention counts."""

from pyspark.sql import functions as F

from kgcompass_spark.sources.datagen import corpus_dataframes
from kgcompass_spark.streaming.ingest import run_stream_to_memory


def test_stream_mention_counts(spark, tmp_path):
    pages, _, _, _ = corpus_dataframes(spark, n_pages=40)
    # two parquet "drops" to exercise multiple micro-batches
    p = str(tmp_path / "drops")
    pages.filter(F.col("url").rlike(r"/([0-9]|1[0-9])$")).write.parquet(p + "/d1")
    pages.filter(~F.col("url").rlike(r"/([0-9]|1[0-9])$")).write.parquet(p + "/d2")
    # streaming source reads the directory tree of both drops
    import shutil, os

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    n = 0
    for d in ("d1", "d2"):
        for f in os.listdir(p + "/" + d):
            if f.endswith(".parquet"):
                shutil.copy(f"{p}/{d}/{f}", f"{flat}/{d}_{f}")
                n += 1
    assert n > 0

    run_stream_to_memory(spark, flat, query_name="mc_test")
    out = spark.sql("SELECT * FROM mc_test").collect()
    assert out, "stream produced no windows"
    types = {r["mtype"] for r in out}
    assert "file" in types and "import" in types
    assert all(r["n_mentions"] > 0 for r in out)


def test_streaming_url_dedup_exactly_once(spark, tmp_path):
    """State-backed streaming dedup: the corpus's duplicate-crawl url must
    come out exactly once."""
    from pyspark.sql import functions as F

    from kgcompass_spark.streaming.ingest import read_pages_stream, streaming_url_dedup

    pages, _, _, _ = corpus_dataframes(spark, n_pages=20)  # includes dup of page 5
    p = str(tmp_path / "dd")
    pages.write.parquet(p)
    assert pages.count() > pages.select("url").distinct().count()

    deduped = streaming_url_dedup(read_pages_stream(spark, p))
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_test")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT url, count(*) AS n FROM dd_test GROUP BY url").collect()
    assert rows and all(r["n"] == 1 for r in rows)


def test_running_mention_totals_stateful(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: totals in
    the final update match the batch counts."""
    from pyspark.sql import functions as F

    from kgcompass_spark.streaming.ingest import (
        read_pages_stream,
        running_mention_totals,
        streaming_mentions,
    )

    pages, _, _, _ = corpus_dataframes(spark, n_pages=20)
    p = str(tmp_path / "rt")
    pages.write.parquet(p)

    ments = streaming_mentions(read_pages_stream(spark, p))
    totals = running_mention_totals(ments)
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName("rt_test")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # latest update per mtype == the batch-mode ground truth
    got = {
        r["mtype"]: r["total_mentions"]
        for r in spark.sql(
            "SELECT mtype, max(total_mentions) AS total_mentions FROM rt_test GROUP BY mtype"
        ).collect()
    }
    from kgcompass_spark.functions.cleaning import clean_issue_text
    from kgcompass_spark.functions.mentions import mentions_dataframe

    prepared = (
        pages.filter(F.col("lang") == "en")
        .withColumn("clean_text", clean_issue_text(F.coalesce("text", F.lit(""))))
        .select("url", "warc_ts", "clean_text")
    )
    want = {
        r["mtype"]: r["n"]
        for r in mentions_dataframe(prepared)
        .select(F.explode("mentions").alias("m"))
        .groupBy(F.col("m.mtype").alias("mtype"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_triple_sink_matches_batch(spark, tmp_path):
    """run_triples_stream: two page drops through the streaming sink emit
    exactly the batch link battery's triples over the distinct urls —
    per-issue independence makes per-micro-batch linking exact (module
    docstring contract)."""
    import os

    from kgcompass_spark.pipeline import (
        extract_frames,
        extract_mentions,
        link_all,
        pages_meta_from,
        prepare_pages,
    )
    from kgcompass_spark.operators.triples import links_to_triples
    from kgcompass_spark.streaming.ingest import run_triples_stream

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=24)
    drops = str(tmp_path / "tdrops")
    os.makedirs(drops)
    # split into two drops deterministically (total over all urls)
    lo = pages.filter(F.crc32("url") % 2 == 0)
    hi = pages.filter(F.crc32("url") % 2 == 1)
    lo.coalesce(1).write.parquet(drops + "/batch_a")
    hi.coalesce(1).write.parquet(drops + "/batch_b")
    import shutil

    flat = str(tmp_path / "tflat")
    os.makedirs(flat)
    for d in ("batch_a", "batch_b"):
        for f in os.listdir(f"{drops}/{d}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{drops}/{d}/{f}", f"{flat}/{d}_{f}")

    out_dir = str(tmp_path / "triple_sink")
    run_triples_stream(spark, flat, entities, out_dir)

    got = sorted(
        tuple(r) for r in spark.read.parquet(out_dir)
        .select("subj", "predicate", "obj", "weight").collect()
    )
    prepared = prepare_pages(pages, None)
    links = link_all(
        extract_mentions(prepared), extract_frames(prepared), entities,
        pages_meta_from(prepared),
    )
    want = sorted(
        tuple(r) for r in links_to_triples(links)
        .select("subj", "predicate", "obj", "weight").collect()
    )
    assert got == want and len(got) > 0
