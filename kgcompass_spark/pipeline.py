"""End-to-end KG construction pipeline (SURVEY.md §3.1 Spark restatement).

    pages → clean_text → mentions → link (broadcast alias dict) →
    triples (+structural, +reverse) → canonical edge table

One declarative plan per stage; stages exchange DataFrames, and
``build_kg`` materializes nothing until the caller writes or collects.
Shuffle inventory (what actually moves at 100 TB):
  1. page dedup (`row_number` over url)           — shuffle on url
  2. issue-ref self-join                          — shuffle on doc_key
  3. triple dedup groupBy(subj, pred, obj)        — shuffle on subj
Everything else is broadcast-join + narrow maps over the pages scan.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.cleaning import clean_issue_text
from .functions.html import page_text
from .functions.mentions import extract_all_mentions, traceback_mentions
from .operators.linking import (
    link_call_mentions,
    link_file_mentions,
    link_issue_refs,
    link_qualified_mentions,
    link_traceback_frames,
)
from .operators.triples import links_to_triples, structural_triples, with_reverse_edges


def prepare_pages(pages: DataFrame, cutoff: datetime | None = None) -> DataFrame:
    """Stage 1: filter + dedup + extract + clean.

    - lang == 'en' only (FIXTURES §6)
    - leakage cutoff: drop pages with warc_ts > cutoff (fl.py:416-431)
    - exactly-once per url: keep earliest crawl (row_number over url)
    - text: prefer pre-extracted column, else HTML→text Arrow UDF
    - clean_issue_text: P1–P3 byte-identical cleaning
    """
    df = pages.filter(F.col("lang") == "en")
    if cutoff is not None:
        df = df.filter(F.col("warc_ts") <= F.lit(cutoff))
    w = Window.partitionBy("url").orderBy("warc_ts")
    df = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return df.withColumn(
        "clean_text", clean_issue_text(page_text(F.col("html"), F.col("text")))
    ).drop("html", "text")


def extract_mentions(prepared: DataFrame) -> DataFrame:
    """Stage 2: mention battery (M1–M10) → exploded mention rows."""
    return (
        prepared.select(
            "url",
            "warc_ts",
            F.explode(extract_all_mentions(F.col("clean_text"))).alias("m"),
        )
        .select("url", "warc_ts", F.col("m.mtype").alias("mtype"), F.col("m.text").alias("text"))
    )


def extract_frames(prepared: DataFrame) -> DataFrame:
    """Stage 2b: traceback frames (M7) → exploded frame rows."""
    return (
        prepared.select(
            "url", F.explode(traceback_mentions(F.col("clean_text"))).alias("f")
        )
        .select("url", "f.file", "f.line", "f.func")
    )


def link_all(
    mentions: DataFrame, frames: DataFrame, entities: DataFrame, pages_meta: DataFrame
) -> DataFrame:
    """Stage 3: all resolvers unioned → (url, entity_id, kind, weight)."""
    return (
        link_file_mentions(mentions, entities)
        .unionByName(link_qualified_mentions(mentions, entities))
        .unionByName(link_call_mentions(mentions, entities))
        .unionByName(link_traceback_frames(frames, entities))
        .unionByName(link_issue_refs(mentions, pages_meta))
    )


def pages_meta_from(prepared: DataFrame) -> DataFrame:
    """(url, warc_ts, doc_key) — doc_key = trailing ordinal in the url,
    the join key for issue cross-references."""
    return prepared.select(
        "url",
        "warc_ts",
        F.regexp_extract(F.col("url"), r"/(\d+)$", 1).alias("doc_key"),
    ).filter(F.col("doc_key") != "")


def build_kg(
    pages: DataFrame,
    entities: DataFrame,
    cutoff: datetime | None = None,
    include_reverse: bool = False,
    persist: bool = False,
) -> dict[str, DataFrame]:
    """Full pipeline. Returns the stage DataFrames (lazy).

    ``persist=True`` caches the prepared-pages stage: the five link
    resolvers all re-derive it otherwise, so the HTML→text Arrow UDF and the
    page-dedup shuffle would run 5× (observed in the physical plan). On a
    cluster this is the difference between one and five scans of the 100-TB
    pages table. Caller owns unpersist.
    """
    prepared = prepare_pages(pages, cutoff)
    if persist:
        prepared = prepared.persist()
    mentions = extract_mentions(prepared)
    frames = extract_frames(prepared)
    meta = pages_meta_from(prepared)
    links = link_all(mentions, frames, entities, meta)
    triples = links_to_triples(links).unionByName(
        structural_triples(entities).select(
            "subj", "predicate", "obj", "weight", "src_url"
        )
    )
    if include_reverse:
        triples = with_reverse_edges(triples)
    return {
        "prepared": prepared,
        "mentions": mentions,
        "frames": frames,
        "links": links,
        "triples": triples,
    }
