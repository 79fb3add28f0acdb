"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator from SURVEY.md §2 (or a
training-data-pipeline addition) expressed over the driver's testdata
tables; ``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL. Column names
and rounding are aligned on both sides so the order-insensitive value-hash
matches. Non-SQL-expressible ops (MinHash-LSH, SimHash, PageRank,
fingerprinting, the KG pipeline itself) have queries-only entries → the
driver records rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# entry — flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: document-pipeline summary over sf0.001 — exact-dedup,
    quality scoring, language ID and token stats on the documents table
    (the Common-Crawl-style input analog)."""
    from kgcompass_spark.functions.text_quality import (
        detect_language,
        quality_score,
        token_count,
    )

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.md5("text").alias("content_hash"),
            token_count(F.col("text")).alias("n_tokens"),
            F.round(quality_score(F.col("text")), 4).alias("quality"),
            detect_language(F.col("text")).alias("detected_lang"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("content_hash").alias("n_unique"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# queries — one per operator
# ---------------------------------------------------------------------------

def _a1_time_validity(spark, sf_dir):
    """A1: artifact time-validity counters (fl.py:416-431 semantics)."""
    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return ev.agg(
        F.countDistinct(F.when(F.col("ts") <= cutoff, F.col("event_id"))).alias("valid_cnt"),
        F.countDistinct(F.when(F.col("ts") > cutoff, F.col("event_id"))).alias("skipped_cnt"),
    )


def _a6_pricing_summary(spark, sf_dir):
    """A6: eval totals (TPC-H-Q1-shaped groupBy aggregation)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def _t1_topk_orders(spark, sf_dir):
    """T1: similarity top-k analog — global ordered limit with full
    deterministic tie-break (knowledge_graph.py:667-668)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


def _t2_pertype_rank(spark, sf_dir):
    """T2: per-type ranked truncation (row_number ≤ k per partition)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("o_orderpriority", "rnk", "o_orderkey",
                F.round("o_totalprice", 2).alias("price"))
    )


def _t3_dedup_keepone(spark, sf_dir):
    """T3: per-key keep-one dedup (latest order per customer)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("latest_orderkey"))
    )


def _j6_interval_join(spark, sf_dir):
    """J6: span/interval join — lineitems shipped within 90 days of order
    date (equi on orderkey + range residual, utils.py:160-221 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


def _j7_timewindow_join(spark, sf_dir):
    """J7: time-windowed join — clicks by the same user within 1h before
    each error event (fl.py:1793-1841 window-join shape)."""
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("user_id").alias("u"), F.col("ts").alias("err_ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("clk_ts")
    )
    joined = err.join(
        clk,
        (err["u"] == clk["u"])
        & (clk["clk_ts"] >= err["err_ts"] - F.expr("INTERVAL 1 HOUR"))
        & (clk["clk_ts"] < err["err_ts"]),
        "left",
    )
    return joined.groupBy("err_id").agg(
        F.sum(F.when(F.col("clk_ts").isNotNull(), 1).otherwise(0)).alias("n_prior_clicks")
    )


def _j11_anti_join(spark, sf_dir):
    """J11/U2: anti-membership — customers with no orders, by segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def _u4_union_dedup(spark, sf_dir):
    """U4: union-then-dedup across sources (candidate-union shape)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n_refs"))
    )


def _p8_token_extract(spark, sf_dir):
    """P8/M-battery analog: token extraction + frequency over documents
    (explode → groupBy → deterministic top-20)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: F.length(t) > 0)
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


def _p10_levenshtein(spark, sf_dir):
    """P10: normalized Levenshtein similarity (builtin, JVM-side)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    target = F.lit("Customer#000000001")
    denom = F.greatest(F.length("c_name"), F.length(target))
    return c.select(
        "c_custkey",
        F.round(1.0 - F.levenshtein("c_name", target) / denom.cast("double"), 4).alias("lev_sim"),
    )


def _p11_cosine_topk(spark, sf_dir):
    """P11/simsearch: brute-force cosine top-10 vs the vec_id=0 embedding."""
    from kgcompass_spark.operators.simsearch import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = brute_force_topk(e.filter(F.col("vec_id") != 0), q, k=10)
    return out.select("vec_id", "rank", F.round("cosine", 4).alias("cos_sim"))


def _dedup_exact_docs(spark, sf_dir):
    """Exact dedup: md5 content-hash groups over documents."""
    from kgcompass_spark.operators.dedup import exact_duplicates

    d = _t(spark, sf_dir, "documents")
    return exact_duplicates(d).select("content_hash", "dup_count", "keeper_id")


def _text_stats(spark, sf_dir):
    """Token/char counts per document (whitespace tokenizer)."""
    d = _t(spark, sf_dir, "documents")
    from kgcompass_spark.functions.text_quality import token_count

    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


def _text_distinct_ratio(spark, sf_dir):
    """Quality sub-metric: distinct-token ratio per doc (repetition)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: F.length(t) > 0)
    return d.select(
        "doc_id",
        F.round(F.size(F.array_distinct(toks)) / F.size(toks).cast("double"), 4).alias("distinct_ratio"),
    )


def _repetition_signals_docs(spark, sf_dir):
    """Gopher-style repetition signals (functions/text_quality.
    repetition_signals — the published pretraining-corpus repetition gate)
    per document. Lines are synthesized deterministically by turning the
    literal token ' table ' into a newline (the corpus text is single-line
    prose), so the line-duplication signals have real content; the oracle
    replays the line split, the duplicate-group char accounting, and the
    top-2/3/4-gram character fractions (lexicographically-smallest gram on
    count ties — the fold's strict-> rule) in SQL."""
    from kgcompass_spark.functions.text_quality import repetition_signals

    d = _t(spark, sf_dir, "documents")
    t = F.regexp_replace(F.col("text"), " table ", "\n")
    return d.select(
        "doc_id", repetition_signals(t).alias("_s")
    ).select("doc_id", "_s.*")


def _gopher_filter_docs(spark, sf_dir):
    """Gopher quality gate (functions/text_quality.gopher_quality_filter)
    with constructed variety: every 2nd doc doubled (crosses the 50-word
    floor), every 3rd given a stopword tail (crosses the ≥2-stopword
    rule) — so the corpus exercises word_count failures, stopwords
    failures and passes. The oracle recomputes EVERY rule's statistic in
    SQL (word stats, line fractions, stopword intersection, and the full
    repetition-signal chain) and applies the same first-violation CASE."""
    from kgcompass_spark.functions.text_quality import gopher_quality_filter

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    t = F.concat(
        F.when(k % 2 == 0, F.concat(F.col("text"), F.lit(" "), F.col("text"))).otherwise(
            F.col("text")
        ),
        F.when(k % 3 == 0, F.lit(" and of to that be have")).otherwise(F.lit("")),
    )
    return d.select("doc_id", gopher_quality_filter(t).alias("_g")).select(
        "doc_id", "_g.*"
    )


def _pii_redaction_docs(spark, sf_dir):
    """PII redaction (functions/webtext.redact_pii) with planted PII: the
    corpus prose carries no digits or '@', so appending one email, one
    phone and one IPv4 per document makes the redaction closed-form — the
    oracle computes the expected redacted text directly (md5-compared) and
    the counts are exactly 1/1/1. Order dependence (IP before phone) is
    part of what's pinned."""
    from kgcompass_spark.functions.webtext import redact_pii

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"), k.cast("string"),
        F.lit("@ex"), (k % 7).cast("string"), F.lit(".org or call 555-01"),
        F.lpad((k % 100).cast("string"), 2, "0"), F.lit("-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (k % 256).cast("string"),
        F.lit(".0."), (k % 40).cast("string"), F.lit(" now"),
    )
    return d.select("doc_id", redact_pii(t).alias("_r")).select(
        "doc_id",
        F.md5(F.col("_r.text_redacted")).alias("redacted_md5"),
        F.col("_r.n_emails").alias("n_emails"),
        F.col("_r.n_ips").alias("n_ips"),
        F.col("_r.n_phones").alias("n_phones"),
    )


def _canonical_urls(spark, sf_dir):
    """URL canonicalization (functions/webtext.canonicalize_url) on messy
    constructed variants: uppercase scheme/host, www., default :443 port,
    trailing slash, utm_*/fbclid tracking params, fragments — plus a
    no-scheme passthrough row every 10th. The oracle computes the expected
    canonical string closed-form (not by replaying the regexes), so the
    check is against INTENT."""
    from kgcompass_spark.functions.webtext import canonicalize_url

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    messy = F.concat(
        F.lit("HTTPS://WWW.Site"), (k % 50).cast("string"), F.lit(".COM"),
        F.when(k % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/a/b"), (k % 9).cast("string"),
        F.when(k % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="), (k % 77).cast("string"),
        F.lit("&utm_campaign=x&q="), (k % 5).cast("string"),
        F.when(k % 2 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    url = F.when(k % 10 == 9, F.concat(F.lit("not a url "), k.cast("string"))).otherwise(
        messy
    )
    return d.select("doc_id", canonicalize_url(url).alias("canonical_url"))


def _lang_distribution(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars")
    )


def _a2_context_score(spark, sf_dir):
    """A2: context score — count of query tokens contained in candidate
    text (fl.py:247-251 semantics), over documents."""
    d = _t(spark, sf_dir, "documents")
    q_terms = F.array(F.lit("table"), F.lit("join"), F.lit("spark"), F.lit("query"))
    toks = F.array_distinct(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: F.length(t) > 0)
    )
    return d.select(
        "doc_id",
        F.size(F.array_intersect(toks, q_terms)).alias("context_score"),
    )


def _a3_pattern_counts(spark, sf_dir):
    """A3: per-pattern hit counters (utils.py:90-100) — how many documents
    match each regex pattern."""
    d = _t(spark, sf_dir, "documents")
    pats = {
        "has_table": r"\btable\b",
        "has_join": r"\bjoin\b",
        "has_digit": r"[0-9]",
    }
    aggs = [
        F.sum(F.when(F.col("text").rlike(p), 1).otherwise(0)).alias(name)
        for name, p in pats.items()
    ]
    return d.agg(*aggs)


def _u1_order_dedup_union(spark, sf_dir):
    """U1/U3: union of ref-id sources + order-preserving dedup — distinct
    (custkey, priority) pairs from two differently-filtered order scans."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey", "o_orderpriority")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey", "o_orderpriority")
    return a.unionByName(b).distinct().groupBy("o_orderpriority").agg(
        F.count("*").alias("n_pairs")
    )


def _g8_connected_components(spark, sf_dir):
    """G8: connected components over the per-customer order chain graph.

    Edges: consecutive orders of the same customer → each customer's orders
    form one component whose id is the min orderkey. SQL-checkable (the
    oracle computes min over the customer partition), while the Spark side
    runs the real iterative large-star/small-star CC.
    """
    from kgcompass_spark.operators.graph import connected_components

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chain = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("dst"),
        F.lag("o_orderkey").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    # CC is type-generic (r7): bigint orderkeys pass straight through — min
    # over longs IS the numeric min the oracle computes, and an 8-byte key
    # shuffles/compares far cheaper than the former zero-padded string.
    edges = chain.select(F.col("src").cast("long").alias("src"),
                         F.col("dst").cast("long").alias("dst"))
    # chain edges are distinct by construction (one lag edge per consecutive
    # order pair), so the op can skip its dedup shuffle
    cc = connected_components(edges, dedup_edges=False)
    # singletons (customers with one order) are their own component
    all_nodes = o.select(F.col("o_orderkey").cast("long").alias("node"))
    full = (
        all_nodes.join(cc, "node", "left")
        .select(
            F.col("node").alias("o_orderkey"),
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
    return full


def _g2_bfs_hops(spark, sf_dir):
    """G2: bounded BFS over the region←nation←customer tree from one root;
    oracle = recursive CTE computing min hop counts."""
    from kgcompass_spark.operators.graph import bounded_sssp

    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    e1 = n.select(
        F.concat(F.lit("region:"), F.col("n_regionkey")).alias("subj"),
        F.lit("contains").alias("predicate"),
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("obj"),
        F.lit(1.0).alias("weight"),
    )
    e2 = c.select(
        F.concat(F.lit("nation:"), F.col("c_nationkey")).alias("subj"),
        F.lit("contains").alias("predicate"),
        F.concat(F.lit("customer:"), F.col("c_custkey")).alias("obj"),
        F.lit(1.0).alias("weight"),
    )
    out = bounded_sssp(e1.unionByName(e2), "region:0", max_hops=2)
    return out.select("node", "hops")


def _g2b_bfs_multi_root(spark, sf_dir):
    """G2 multi-root batch variant: BFS hops from EVERY region root in one
    job (bounded_sssp_multi); oracle = recursive CTE seeded from all roots."""
    from kgcompass_spark.operators.graph import bounded_sssp_multi

    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    r = _t(spark, sf_dir, "region")
    e1 = n.select(
        F.concat(F.lit("region:"), F.col("n_regionkey")).alias("subj"),
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("obj"),
        F.lit(1.0).alias("weight"),
    )
    e2 = c.select(
        F.concat(F.lit("nation:"), F.col("c_nationkey")).alias("subj"),
        F.concat(F.lit("customer:"), F.col("c_custkey")).alias("obj"),
        F.lit(1.0).alias("weight"),
    )
    roots = r.select(F.concat(F.lit("region:"), F.col("r_regionkey")).alias("root"))
    out = bounded_sssp_multi(e1.unionByName(e2), roots, max_hops=2)
    return out.select("root", "node", "hops")


def _evidence_export_batched(spark, sf_dir):
    """Batched evidence export (plans/evidence.evidence_export_all —
    reference export_kg_evidence_graph.py:198-273) over a deterministic KG
    derived from supplier/lineitem:

        issue:<nation>  -points to file->           file:s<supplier>
        file:s<supplier> -contains method in file-> method:<name>@s<home>

    for each distinct (l_suppkey, l_partkey); ``home`` = the GLOBAL min
    supplier of the part, so each method names exactly one file. With
    max_hops=2 over the symmetric closure every method target sits at
    distance 2; support = distinct first-hop seeds (the root nation's
    supplier files that supply the part); and the anchor File-on-best-path
    half is SQL-decidable: the lexicographically smallest min-hop path runs
    through the nation's min supplier of the part, so anchor ⇔ that
    supplier IS the global min (the method's own file). Name variants pin
    the target-only 'test' exclusion + pytest allowlist in the oracle.
    """
    from kgcompass_spark.plans.evidence import evidence_export_all

    pad_n = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    pad_s = lambda c: F.lpad(c.cast("string"), 6, "0")  # noqa: E731
    pad_p = lambda c: F.lpad(c.cast("string"), 7, "0")  # noqa: E731
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey").distinct()
    home = li.groupBy("l_partkey").agg(F.min("l_suppkey").alias("home"))
    name = (
        F.when(
            F.col("l_partkey") % 26 == 0,
            F.concat(F.lit("pytest_p"), pad_p(F.col("l_partkey"))),
        )
        .when(
            F.col("l_partkey") % 13 == 0,
            F.concat(F.lit("latest_p"), pad_p(F.col("l_partkey"))),
        )
        .otherwise(F.concat(F.lit("p"), pad_p(F.col("l_partkey"))))
    )
    e1 = sup.select(
        F.concat(F.lit("issue:"), pad_n(F.col("s_nationkey"))).alias("subj"),
        F.lit("points to file").alias("predicate"),
        F.concat(F.lit("file:s"), pad_s(F.col("s_suppkey"))).alias("obj"),
        F.lit(1.0).alias("weight"),
        F.lit(None).cast("string").alias("src_url"),
    )
    e2 = li.join(home, "l_partkey").select(
        F.concat(F.lit("file:s"), pad_s(F.col("l_suppkey"))).alias("subj"),
        F.lit("contains method in file").alias("predicate"),
        F.concat(
            F.lit("method:"), name, F.lit("@s"), pad_s(F.col("home"))
        ).alias("obj"),
        F.lit(1.0).alias("weight"),
        F.lit(None).cast("string").alias("src_url"),
    )
    roots = sup.select(
        F.concat(F.lit("issue:"), pad_n(F.col("s_nationkey"))).alias("root")
    ).distinct()
    # the KG's (subj, obj) pairs are unique by construction (distinct
    # supplier/part pairs; disjoint node namespaces survive the symmetric
    # closure), so the min-predicate collapse is an identity — pass
    # edges_collapsed=True and the operator compacts with a keyed
    # repartition instead of a 12M-row SortAggregate (r7, ~3 s at sf1)
    out = evidence_export_all(
        e1.unionByName(e2), roots, max_hops=2, edges_collapsed=True
    )
    return out.select(
        "root", "node", "entity_type", "name", "file_path", "distance",
        "support", F.col("anchor").cast("boolean").alias("anchor"),
        "rank", "type_rank",
    )


def _evidence_paths_batched(spark, sf_dir):
    """Multi-path carrying in the batched evidence export (seeded_support
    path_k — reference knowledge_graph.py:1075-1138 path_details): same
    supplier/lineitem KG as ``evidence_export_batched`` but with path_k=4,
    projecting per-path facts the oracle can derive: at max_hops=2 every
    min-hop path is root→file:s<X>→method and paths sort lexicographically
    by node sequence, so the k-th retained path's first node is the k-th
    SMALLEST supplier of the part within the root's nation, and
    n_paths = least(4, support)."""
    from kgcompass_spark.plans.evidence import evidence_export_all

    pad_n = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    pad_s = lambda c: F.lpad(c.cast("string"), 6, "0")  # noqa: E731
    pad_p = lambda c: F.lpad(c.cast("string"), 7, "0")  # noqa: E731
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey").distinct()
    home = li.groupBy("l_partkey").agg(F.min("l_suppkey").alias("home"))
    e1 = sup.select(
        F.concat(F.lit("issue:"), pad_n(F.col("s_nationkey"))).alias("subj"),
        F.lit("points to file").alias("predicate"),
        F.concat(F.lit("file:s"), pad_s(F.col("s_suppkey"))).alias("obj"),
        F.lit(1.0).alias("weight"),
        F.lit(None).cast("string").alias("src_url"),
    )
    e2 = li.join(home, "l_partkey").select(
        F.concat(F.lit("file:s"), pad_s(F.col("l_suppkey"))).alias("subj"),
        F.lit("contains method in file").alias("predicate"),
        F.concat(
            F.lit("method:p"), pad_p(F.col("l_partkey")),
            F.lit("@s"), pad_s(F.col("home")),
        ).alias("obj"),
        F.lit(1.0).alias("weight"),
        F.lit(None).cast("string").alias("src_url"),
    )
    roots = sup.select(
        F.concat(F.lit("issue:"), pad_n(F.col("s_nationkey"))).alias("root")
    ).distinct()
    out = evidence_export_all(e1.unionByName(e2), roots, max_hops=2, path_k=4)
    return out.select(
        "root",
        "node",
        "support",
        F.size("path_details").alias("n_paths"),
        F.element_at(F.element_at("path_details", 1), 1)["node"].alias("first_seed"),
        # ANSI mode: element_at throws past the end; support-1 targets
        # carry a single path
        F.try_element_at(
            F.try_element_at(F.col("path_details"), F.lit(2)), F.lit(1)
        )["node"].alias("second_seed"),
        F.element_at("best_path", 1)["predicate"].alias("p1_pred"),
        F.element_at("best_path", 2)["predicate"].alias("p2_pred"),
    )


def _context_commit_topk(spark, sf_dir):
    """The REAL commit-context stage (operators/context.link_commit_context
    — fl.py:2412-2500) over tables the oracle can mirror exactly: orders as
    issues (o_comment text, o_orderdate as the page ts) and parts as
    commits (p_comment message, synthetic commit ts, one .py changed file,
    every 11th a merge). Oracle reproduces the whole chain in SQL:
    context_tokens (ident regex ≥3 chars, 14 stopwords, version tokens),
    maintenance-regex + merge eligibility, leakage guard, score>0, the
    top-5-per-issue (-score, -ts, id) selection, and both edge families."""
    from kgcompass_spark.operators.context import link_commit_context

    d = _t(spark, sf_dir, "documents")
    issues = d.select(
        F.col("doc_id").cast("string").alias("url"),
        (
            F.lit("1996-01-01").cast("timestamp")
            + F.make_interval(days=(F.col("doc_id") % 1000).cast("int"))
        ).alias("warc_ts"),
        F.col("text").alias("clean_text"),
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    commits = p.select(
        F.lpad(F.col("p_partkey").cast("string"), 7, "0").alias("commit_id"),
        F.concat_ws(" ", "p_name", "p_type").alias("message"),
        (
            F.lit("1995-06-01").cast("timestamp")
            + F.make_interval(days=(F.col("p_partkey") % 1460).cast("int"))
        ).alias("committed_ts"),
        F.array(F.lit("pkg/data_loader.py")).alias("changed_files"),
        F.array().cast(
            "array<struct<file_path:string,start_line:int,end_line:int>>"
        ).alias("changed_spans"),
        F.when(F.col("p_partkey") % 11 == 0, F.lit(2)).otherwise(F.lit(1)).alias(
            "n_parents"
        ),
    )
    out = link_commit_context(issues, commits, limit=5)
    return out.select(
        "subj", "predicate", "obj", F.round("weight", 2).alias("weight"), "src_url"
    )


def _context_repair_topk(spark, sf_dir):
    """The repair-experience stage (operators/context.link_repair_experience
    — fl.py:2317-2410) over the same documents/parts cast: every third part
    gets a 'fix broken ...' message (matches REPAIR_EXPERIENCE_REGEX), the
    rest stay ineligible; min_score=1 so the corpus vocabulary produces
    matches. Oracle mirrors eligibility (merge + maintenance), the repair
    regex on the first lines, scoring, leakage, the top-12 (-score, -ts,
    id) selection, and both edge families (STRONG issue edge + NORMAL
    mentions-file edge)."""
    from kgcompass_spark.operators.context import link_repair_experience

    d = _t(spark, sf_dir, "documents")
    issues = d.select(
        F.col("doc_id").cast("string").alias("url"),
        (
            F.lit("1996-01-01").cast("timestamp")
            + F.make_interval(days=(F.col("doc_id") % 1000).cast("int"))
        ).alias("warc_ts"),
        F.col("text").alias("clean_text"),
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    base_msg = F.concat_ws(" ", "p_name", "p_type")
    commits = p.select(
        F.lpad(F.col("p_partkey").cast("string"), 7, "0").alias("commit_id"),
        F.when(
            F.col("p_partkey") % 3 == 0, F.concat(F.lit("fix broken "), base_msg)
        ).otherwise(base_msg).alias("message"),
        (
            F.lit("1995-06-01").cast("timestamp")
            + F.make_interval(days=(F.col("p_partkey") % 1460).cast("int"))
        ).alias("committed_ts"),
        F.array(F.lit("pkg/data_loader.py")).alias("changed_files"),
        F.array().cast(
            "array<struct<file_path:string,start_line:int,end_line:int>>"
        ).alias("changed_spans"),
        F.when(F.col("p_partkey") % 11 == 0, F.lit(2)).otherwise(F.lit(1)).alias(
            "n_parents"
        ),
    )
    out = link_repair_experience(issues, commits, min_score=1)
    return out.select(
        "subj", "predicate", "obj", F.round("weight", 2).alias("weight"), "src_url"
    )


def _context_docs_topk(spark, sf_dir):
    """The documentation stage (operators/context.link_documentation —
    fl.py:2086-2316) end-to-end: parts become guide docs with a backticked
    dotted symbol (every 7th referencing a symbol that resolves to
    NOTHING — pinning the reference's linked-files gate: selected but
    edge-less), and a parts-derived entity inventory resolves the rest.
    Oracle mirrors doc eligibility, scoring, the top-8 (-score, doc_path)
    selection, symbol resolution, and all three edge families. The
    per-issue doc-node ids carry a sha1 fragment DuckDB cannot compute, so
    BOTH sides project it away (':h' suffix) — multiplicities still
    compare exactly."""
    from kgcompass_spark.operators.context import link_documentation

    d = _t(spark, sf_dir, "documents")
    issues = d.select(
        F.col("doc_id").cast("string").alias("url"),
        (
            F.lit("1996-01-01").cast("timestamp")
            + F.make_interval(days=(F.col("doc_id") % 1000).cast("int"))
        ).alias("warc_ts"),
        F.col("text").alias("clean_text"),
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    k = F.col("p_partkey").cast("string")
    sym = F.when(
        F.col("p_partkey") % 7 == 0, F.concat(F.lit("pkg.mod.nothing"), k)
    ).otherwise(F.concat(F.lit("pkg.mod.widget"), k))
    docs = p.select(
        F.concat(F.lit("docs/guide"), k, F.lit(".md")).alias("doc_path"),
        F.concat(
            F.lit("guide for "), F.col("p_name"), F.lit(" "), F.col("p_type"),
            F.lit(" `"), sym, F.lit("`"),
        ).alias("text"),
    )
    kind = F.when(F.col("p_partkey") % 2 == 0, F.lit("method")).otherwise(
        F.lit("class")
    )
    name = F.concat(F.lit("pkg.mod.widget"), k)
    fpath = F.concat(F.lit("pkg/mod"), k, F.lit(".py"))
    entities = p.select(
        F.concat(kind, F.lit(":"), name, F.lit("@"), fpath).alias("entity_id"),
        kind.alias("kind"),
        fpath.alias("file_path"),
        name.alias("name"),
    )
    out = link_documentation(issues, docs, entities)
    strip = lambda c: F.regexp_replace(c, r":[0-9a-f]{12}$", ":h")  # noqa: E731
    return out.select(
        strip(F.col("subj")).alias("subj"),
        "predicate",
        strip(F.col("obj")).alias("obj"),
        F.round("weight", 2).alias("weight"),
        "src_url",
    )


# --- dedup family, oracle-parameterized hash --------------------------------
#
# These run the SAME banding / bit-vote / winnowing logic as the xxhash64
# scale path, under the md5_60 hash family (functions/hashing.py) that
# DuckDB reproduces — so the whole pipeline is value-checked end-to-end.

def _minhash_near_dups(spark, sf_dir):
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.dedup import minhash_lsh_candidates, minhash_signatures

    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, hash_fn=md5_60)
    return minhash_lsh_candidates(sigs, hash_fn=md5_60).filter(
        F.col("n_shared_bands") >= 2
    )


def _domain_cap_docs(spark, sf_dir):
    """Per-source document cap (operators/curation.py domain_cap): keep
    the top 20 documents per source by (n_chars desc, doc_id asc) via the
    exact two-phase skew-safe selection; oracle = the plain QUALIFY
    window over the same key."""
    from kgcompass_spark.operators.curation import domain_cap

    d = _t(spark, sf_dir, "documents")
    key = F.struct((-F.col("n_chars")).alias("q"), F.col("doc_id").alias("id"))
    return domain_cap(d, 20, key).select("doc_id", "source", "n_chars")


def _hash_sample_docs(spark, sf_dir):
    """Deterministic 10% id-hash sample (operators/curation.py
    hash_sample) under the md5_60 oracle hash with salt 's42'."""
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.curation import hash_sample

    d = _t(spark, sf_dir, "documents")
    return hash_sample(d, 0.10, salt="s42", hash_fn=md5_60).select(
        "doc_id", "lang", "n_chars"
    )


def _contamination_docs(spark, sf_dir):
    """Benchmark decontamination sweep (operators/dedup.py
    contamination_check): documents vs a benchmark slice of the same
    corpus (doc_id % 20 == 0) — every train doc sharing at least one
    verbatim word 8-gram with a benchmark doc, with the distinct shared
    gram count. The oracle replays the shingle construction and the
    gram join closed-form in DuckDB."""
    from kgcompass_spark.operators.dedup import contamination_check

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    train = d.filter(F.col("doc_id") % 20 != 0)
    return contamination_check(train, bench)


def _simhash_docs(spark, sf_dir):
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), bits=60, hash_fn=md5_60)


def _fingerprint_docs(spark, sf_dir):
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.functions.text_quality import fingerprint

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text"), hash_fn=md5_60).alias("fp"))


def _detect_language_docs(spark, sf_dir):
    from kgcompass_spark.functions.text_quality import detect_language

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", detect_language(F.col("text")).alias("detected"))


def _lsh_cosine_topk(spark, sf_dir):
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.simsearch import lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = lsh_topk(e.filter(F.col("vec_id") != 0), q, k=10, hash_fn=md5_60)
    return out.select("vec_id", "rank", F.round("cosine", 4).alias("cos_sim"))


def _ivf_cosine_topk(spark, sf_dir):
    """ANN IVF variant (operators/simsearch.ivf_topk) under the md5_60
    centroid hash: deterministic hash-sampled centroids, nearest-cell
    assignment, n_probe=4 multiprobe, exact cosine within probed cells —
    the full IVF pipeline value-checked against SQL."""
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.simsearch import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.lit(0).cast("long").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ivf_topk(e.filter(F.col("vec_id") != 0), q, k=10, hash_fn=md5_60)
    return out.select("vec_id", "rank", F.round("cosine", 4).alias("cos_sim"))


def _g6_pagerank(spark, sf_dir):
    from kgcompass_spark.operators.graph import pagerank

    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    e1 = n.select(
        F.concat(F.lit("region:"), F.col("n_regionkey")).alias("subj"),
        F.lit("contains").alias("predicate"),
        F.concat(F.lit("nation:"), F.col("n_nationkey")).alias("obj"),
        F.lit(1.0).alias("weight"),
    )
    e2 = s.select(
        F.concat(F.lit("nation:"), F.col("s_nationkey")).alias("subj"),
        F.lit("contains").alias("predicate"),
        F.concat(F.lit("supplier:"), F.col("s_suppkey")).alias("obj"),
        F.lit(1.0).alias("weight"),
    )
    return pagerank(e1.unionByName(e2), iters=12).select(
        "node", F.round("score", 6).alias("score")
    )


def _lsh_alias_link(spark, sf_dir):
    """Entity-linking candidate generation with MinHash-LSH blocking against
    a broadcast alias dictionary (operators/linking.lsh_alias_link) under
    the md5_60 hash family — alias dictionary = part names, mentions =
    part names with every 'e' deleted (a deterministic surface corruption
    both engines reproduce). Scored with exact char-3-gram Jaccard, top-3
    per mention."""
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.linking import lsh_alias_link

    p = _t(spark, sf_dir, "part")
    aliases = p.select(
        F.col("p_partkey").cast("long").alias("entity_id"),
        F.col("p_name").alias("alias"),
    )
    mentions = p.filter(F.col("p_partkey") % 7 == 1).select(
        F.concat(F.lit("m"), F.col("p_partkey").cast("string")).alias("url"),
        F.regexp_replace("p_name", "e", "").alias("text"),
    )
    out = lsh_alias_link(mentions, aliases, hash_fn=md5_60)
    return out.select(
        "url", "text", "entity_id", "alias", "n_shared_bands",
        F.round("jaccard", 6).alias("jaccard"), "rank",
    )


def _lsh_canonical_map(spark, sf_dir):
    """Fuzzy canonicalization end-to-end (operators/canonicalize.
    fuzzy_canonical_mapping): three deterministic spelling variants per
    part name (raw / underscores / vowel-'e'-deleted) → char-3-gram
    minhash LSH blocking → exact-Jaccard ≥ 0.6 mention graph →
    connected-components union-find → canonical id = min entity id. The
    DuckDB oracle replays the identical blocking + threshold and computes
    the closure with a recursive-CTE reachability."""
    from kgcompass_spark.functions.hashing import md5_60
    from kgcompass_spark.operators.canonicalize import fuzzy_canonical_mapping

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 3 == 0)
    pid = F.lpad(F.col("p_partkey").cast("string"), 7, "0")

    def variant(tag, name_col):
        return p.select(
            F.concat(F.lit("p"), pid, F.lit(":" + tag)).alias("entity_id"),
            name_col.alias("name"),
        )

    names = (
        variant("a", F.col("p_name"))
        .unionByName(variant("b", F.translate("p_name", " ", "_")))
        .unionByName(variant("c", F.regexp_replace("p_name", "e", "")))
    )
    return fuzzy_canonical_mapping(names, hash_fn=md5_60)


def _kg_pipeline_triples(spark, sf_dir):
    """The KG-construction pipeline itself on the deterministic fixture
    corpus — counts per predicate (rows-only; DuckDB can't run the Arrow
    UDF + linking pipeline)."""
    from kgcompass_spark.pipeline import build_kg
    from kgcompass_spark.sources.datagen import CUTOFF, corpus_dataframes

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=120)
    out = build_kg(pages, entities, cutoff=CUTOFF)
    return (
        out["triples"]
        .groupBy("predicate")
        .agg(F.count("*").alias("n"), F.round(F.avg("weight"), 4).alias("avg_weight"))
        .orderBy("predicate")
    )


def _ngram_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard verification (dedup family) — exact word-3-shingle
    Jaccard on a deterministic pair set (each doc vs its successor), so the
    set arithmetic is DuckDB-checkable."""
    from kgcompass_spark.operators.dedup import ngram_jaccard

    d = _t(spark, sf_dir, "documents")
    pairs = d.select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
    )
    out = ngram_jaccard(d, pairs)
    return out.select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


def _a8_eval_summary(spark, sf_dir):
    """§3.3 eval harness (calc_prefl semantics) — oracle-checked on a
    synthetic prediction/ground-truth shape over orders+lineitem:
    instances = every 32nd order; predictions = its lineitems ranked by
    price; gt entities = its 'R'-returnflag parts; gt files = line-1 part."""
    from kgcompass_spark.plans.eval import prefl_per_instance, prefl_summary

    li = _t(spark, sf_dir, "lineitem")
    insts = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 32 == 0).select(
        F.col("o_orderkey").alias("instance_id")
    )
    base = li.join(insts, li["l_orderkey"] == insts["instance_id"])
    preds = base.select(
        "instance_id",
        F.col("l_partkey").cast("string").alias("signature"),
        F.concat(F.lit("f/"), F.col("l_partkey").cast("string")).alias("file_path"),
        F.row_number()
        .over(
            Window.partitionBy("instance_id").orderBy(
                F.desc("l_extendedprice"), F.asc("l_linenumber")
            )
        )
        .alias("rank"),
    )
    gt_entities = (
        base.filter(F.col("l_returnflag") == "R")
        .select("instance_id", F.col("l_partkey").cast("string").alias("signature"))
        .distinct()
    )
    gt_files = base.filter(F.col("l_linenumber") == 1).select(
        "instance_id",
        F.concat(F.lit("f/"), F.col("l_partkey").cast("string")).alias("patch_file"),
    )
    return prefl_summary(prefl_per_instance(preds, gt_entities, gt_files))


def _ranked_related(spark, sf_dir):
    """The reference's MAIN ranked output (knowledge_graph.py:988-1399):
    similarity-ranked related entities for one root issue over the full KG
    incl. context stages — BFS cost × embedding cosine × Levenshtein ×
    identifier/evidence boosts → per-type truncation. Rows-only (Arrow
    encoder UDF + iterative SSSP are not DuckDB-expressible)."""
    from kgcompass_spark.pipeline import build_kg
    from kgcompass_spark.plans.related import ranked_related_entities
    from kgcompass_spark.sources.datagen import (
        CUTOFF,
        _make_page,
        _page_url,
        context_corpus_dataframes,
        corpus_dataframes,
    )

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=120)
    commits, docs, _ = context_corpus_dataframes(spark, n_pages=120)
    out = build_kg(pages, entities, cutoff=CUTOFF, commits=commits, docs=docs)
    root_url = _page_url(6)
    root_text = _make_page(6)[2]
    issue_texts = out["prepared"].select("url", F.col("clean_text").alias("text"))
    rr = ranked_related_entities(
        out["triples"], entities, root_url, root_text,
        issue_texts=issue_texts, max_cost=2.0,
        identifier_boost_weight=0.2, evidence_path_boost_weight=0.1,
    )
    return rr.select(
        "node", "entity_type", F.round("similarity", 4).alias("similarity"),
        F.round("distance", 4).alias("distance"), "hops", "type_rank",
    )


def _result_documents(spark, sf_dir):
    """Per-instance result-document export (fl.py:465-468, 2719-2733;
    knowledge_graph.py:1179-1262): the full batched pipeline — KG build →
    ranked_related_all over EVERY issue → one reference-shaped nested
    document per root (related_entities methods/classes/issues with the
    root inserted at similarity 2.0, artifact_stats, kg_params, run_meta).
    Rows-only: blocked from a DuckDB oracle by the HTML-extraction +
    encoder UDF battery upstream; document assembly itself is pinned by
    the schema fixture test (tests/test_results.py)."""
    from kgcompass_spark.pipeline import build_kg
    from kgcompass_spark.plans.related import ranked_related_all
    from kgcompass_spark.plans.results import result_documents
    from kgcompass_spark.sources.datagen import CUTOFF, corpus_dataframes

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=120)
    out = build_kg(pages, entities, cutoff=CUTOFF)
    issue_texts = out["prepared"].select("url", F.col("clean_text").alias("text"))
    ranked = ranked_related_all(
        out["triples"], entities, issue_texts, max_cost=2.0, limit=25
    )
    issue_meta = out["prepared"].select(
        "url",
        F.substring_index(F.col("clean_text"), "\n", 1).alias("title"),
        F.col("clean_text").alias("content"),
    )
    docs = result_documents(
        ranked, entities, issue_meta,
        repo_name="alphacore/alphacore", benchmark_name="fixture",
        saved_at="1970-01-01T00:00:00+00:00",
    )
    return docs.select(
        "instance_id",
        F.size("related_entities.methods").alias("n_methods"),
        F.size("related_entities.classes").alias("n_classes"),
        F.size("related_entities.issues").alias("n_issues"),
        F.col("related_entities.issues")[0]["similarity"].alias("root_sim"),
        F.round(
            F.coalesce(
                F.col("related_entities.methods")[0]["similarity"], F.lit(0.0)
            ),
            4,
        ).alias("top_method_sim"),
        F.col("kg_params.decay_factor").alias("decay_factor"),
        F.col("run_meta.saved_at").alias("saved_at"),
    )


_RR_ROOT_TEXT = (
    "crash in proc_7 when rendering n3.py widgets; see also proc_11 regression"
)


def _ranked_related_fixture(spark, sf_dir):
    """G4/T2-T7 blend oracle: ranked_related_entities with FIXTURE
    embeddings (node_embeddings table + root_vec — no encoder UDF), over a
    deterministic nation/supplier KG where the bounded-SSSP costs are
    closed-form (every edge weight 0.9, max_cost 2.0 ⇒ exactly the 1- and
    2-hop frontier). Verifies end-to-end: target filter (methods, LEAF
    classes, issues), test-name exclusion, cos×W + lev×(1−W) blend with
    DECAY^cost (knowledge_graph.py:1140-1148), identifier boosts, and the
    per-type rank window — all against plain SQL."""
    from kgcompass_spark.plans.related import ranked_related_entities

    fx = _rr_fixture_kg(spark, sf_dir)
    rr = ranked_related_entities(
        fx["triples"], fx["entities"], "root", _RR_ROOT_TEXT,
        issue_texts=fx["issue_texts"], max_cost=2.0,
        identifier_boost_weight=0.2, evidence_path_boost_weight=0.0,
        unsup_gnn_mode="off",
        node_embeddings=fx["node_embeddings"], root_vec=fx["root_vec"],
    )
    return rr.select(
        "node", "entity_type", F.round("similarity", 4).alias("similarity"),
        F.round("distance", 4).alias("distance"), "hops", "type_rank",
    )


# (tag, decay_factor, vector_similarity_weight) — the reference bulk
# driver's `tag:decay,sim` param pairs (mine_kg_bulk.py:207-216)
_SWEEP_PARAMS = [("d60_w30", 0.6, 0.3), ("d80_w50", 0.8, 0.5)]


def _ranked_sweep_fixture(spark, sf_dir):
    """KG-param sweep oracle (mine_kg_bulk.py sweep loop, Spark-first):
    EVERY (decay, sim-weight) pair ranked from ONE shared candidate table
    over the same fixture KG as ranked_related_fixture — the oracle is the
    per-pair scored SELECT unioned across pairs, so the sweep's re-blend
    (not just one pair) is value-checked."""
    from kgcompass_spark.plans.related import ranked_related_sweep

    fx = _rr_fixture_kg(spark, sf_dir)
    root_emb = fx["node_embeddings"].sparkSession.createDataFrame(
        [("issue:root", fx["root_vec"])], "node string, embedding array<double>"
    )
    node_emb = fx["node_embeddings"].unionByName(root_emb)
    issue_texts = spark.createDataFrame(
        [("root", _RR_ROOT_TEXT)], "url string, text string"
    )
    out = ranked_related_sweep(
        fx["triples"], fx["entities"], issue_texts, _SWEEP_PARAMS,
        max_cost=2.0, identifier_boost_weight=0.2, node_embeddings=node_emb,
    )
    return out.select(
        "param_tag", "node", "entity_type",
        F.round("similarity", 4).alias("similarity"),
        F.round("distance", 4).alias("distance"), "hops", "type_rank",
    )


def _result_documents_fixture(spark, sf_dir):
    """Value-oracle for the per-instance result-document assembly
    (plans/results.py): fixture-KG ranking (ranked_related_all with fixture
    embeddings, 25/type) → result_documents → the nested arrays flattened
    back to (section, 0-based pos, entity fields) rows — array ordering,
    per-type slicing, field routing per entity type, and the root issue
    inserted at similarity 2.0 / distance 0 are all SQL-checked."""
    from kgcompass_spark.plans.related import ranked_related_all
    from kgcompass_spark.plans.results import result_documents

    fx = _rr_fixture_kg(spark, sf_dir)
    root_emb = spark.createDataFrame(
        [("issue:root", fx["root_vec"])], "node string, embedding array<double>"
    )
    node_emb = fx["node_embeddings"].unionByName(root_emb)
    issue_texts = spark.createDataFrame(
        [("root", _RR_ROOT_TEXT)], "url string, text string"
    )
    ranked = ranked_related_all(
        fx["triples"], fx["entities"], issue_texts, max_cost=2.0, limit=25,
        identifier_boost_weight=0.2, node_embeddings=node_emb,
    )
    n = _t(spark, sf_dir, "nation")
    nk = F.col("n_nationkey").cast("string")
    issue_meta = n.filter(F.col("n_nationkey") % 3 == 0).select(
        F.concat(F.lit("i"), nk).alias("url"),
        F.concat(F.lit("issue about "), F.col("n_name")).alias("title"),
        F.concat(F.lit("issue about "), F.col("n_name")).alias("content"),
    ).unionByName(
        spark.createDataFrame(
            [("root", "Root issue", _RR_ROOT_TEXT)],
            "url string, title string, content string",
        )
    )
    docs = result_documents(
        ranked, fx["entities"], issue_meta,
        saved_at="1970-01-01T00:00:00+00:00",
    )

    def flat(section, field):
        return docs.select(
            "instance_id",
            F.lit(section).alias("section"),
            F.posexplode(F.col(f"related_entities.{field}")).alias("pos", "e"),
        )

    f = (
        flat("method", "methods")
        .unionByName(flat("class", "classes"))
        .unionByName(flat("issue", "issues"))
    )
    return f.select(
        "instance_id", "section", F.col("pos").cast("long").alias("pos"),
        F.col("e.name").alias("name"),
        F.col("e.signature").alias("signature"),
        F.col("e.file_path").alias("file_path"),
        F.col("e.issue_id").alias("issue_id"),
        F.round("e.similarity", 4).alias("similarity"),
        F.round("e.distance", 4).alias("distance"),
        F.col("e.graph_node_id").alias("graph_node_id"),
    )


def _rr_fixture_kg(spark, sf_dir):
    """Deterministic nation/supplier KG + metadata + fixture embeddings
    shared by the ranked_related_fixture and ranked_sweep_fixture entries
    (see _ranked_related_fixture's docstring for the shape)."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    emb = _t(spark, sf_dir, "embeddings")
    nk = F.col("n_nationkey").cast("string")
    sk = F.col("s_suppkey").cast("string")
    snk = F.col("s_nationkey").cast("string")
    root = F.lit("issue:root")
    w9 = F.lit(0.9).alias("weight")
    no_src = F.lit("").alias("src_url")
    e_root_file = n.select(
        root.alias("subj"), F.lit("mentions").alias("predicate"),
        F.concat(F.lit("file:n"), nk).alias("obj"), w9, no_src,
    )
    e_file_m = s.select(
        F.concat(F.lit("file:n"), snk).alias("subj"),
        F.lit("contains method").alias("predicate"),
        F.concat(F.lit("method:s"), sk).alias("obj"), w9, no_src,
    )
    e_file_c = n.select(
        F.concat(F.lit("file:n"), nk).alias("subj"),
        F.lit("contains class").alias("predicate"),
        F.concat(F.lit("class:c"), nk).alias("obj"), w9, no_src,
    )
    e_root_issue = n.filter(F.col("n_nationkey") % 3 == 0).select(
        root.alias("subj"), F.lit("references").alias("predicate"),
        F.concat(F.lit("issue:i"), nk).alias("obj"), w9, no_src,
    )
    # classes in nations ≡ 0 (mod 4) contain methods → non-leaf, excluded
    e_class_m = s.filter(F.col("s_nationkey") % 4 == 0).select(
        F.concat(F.lit("class:c"), snk).alias("subj"),
        F.lit("contains method").alias("predicate"),
        F.concat(F.lit("method:s"), sk).alias("obj"), w9, no_src,
    )
    triples = (
        e_root_file.unionByName(e_file_m).unionByName(e_file_c)
        .unionByName(e_root_issue).unionByName(e_class_m)
    )
    entities = s.select(
        F.concat(F.lit("method:s"), sk).alias("entity_id"),
        F.concat(F.lit("proc_"), sk).alias("name"),
        F.concat(F.lit("def proc_"), sk, F.lit("(x)")).alias("signature"),
        F.col("s_name").alias("doc_string"),
        F.concat(F.lit("src/n"), snk, F.lit(".py")).alias("file_path"),
        F.col("s_suppkey").cast("int").alias("start_line"),
        (F.col("s_suppkey") + 10).cast("int").alias("end_line"),
    ).unionByName(
        n.select(
            F.concat(F.lit("class:c"), nk).alias("entity_id"),
            F.concat(F.lit("Widget"), nk).alias("name"),
            F.concat(F.lit("class Widget"), nk).alias("signature"),
            F.col("n_name").alias("doc_string"),
            F.concat(F.lit("src/n"), nk, F.lit(".py")).alias("file_path"),
            F.col("n_nationkey").cast("int").alias("start_line"),
            (F.col("n_nationkey") + 20).cast("int").alias("end_line"),
        )
    )
    issue_texts = n.filter(F.col("n_nationkey") % 3 == 0).select(
        F.concat(F.lit("i"), nk).alias("url"),
        F.concat(F.lit("issue about "), F.col("n_name")).alias("text"),
    )
    node_embeddings = (
        s.select(
            F.concat(F.lit("method:s"), sk).alias("node"),
            (F.col("s_suppkey") % 50).alias("vec_id"),
        )
        .unionByName(
            n.select(
                F.concat(F.lit("class:c"), nk).alias("node"),
                ((F.col("n_nationkey") * 7 + 3) % 50).alias("vec_id"),
            )
        )
        .unionByName(
            n.filter(F.col("n_nationkey") % 3 == 0).select(
                F.concat(F.lit("issue:i"), nk).alias("node"),
                ((F.col("n_nationkey") * 5 + 1) % 50).alias("vec_id"),
            )
        )
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select("node", "embedding")
    )
    root_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    return dict(
        triples=triples, entities=entities, issue_texts=issue_texts,
        node_embeddings=node_embeddings, root_vec=root_vec,
    )


def _kg_full_predicates(spark, sf_dir):
    """Full pipeline incl. commit / repair-experience / documentation
    context stages — per-predicate counts; all 17 forward predicate pairs
    from PREDICATE_INVERSE appear (rows-only; the token-blocked scoring
    joins aren't SQL-expressible in DuckDB without the same UDF battery)."""
    from kgcompass_spark.pipeline import build_kg
    from kgcompass_spark.sources.datagen import (
        CUTOFF,
        context_corpus_dataframes,
        corpus_dataframes,
    )

    pages, entities, _, _ = corpus_dataframes(spark, n_pages=120)
    commits, docs, _ = context_corpus_dataframes(spark, n_pages=120)
    out = build_kg(pages, entities, cutoff=CUTOFF, commits=commits, docs=docs)
    return (
        out["triples"]
        .groupBy("predicate")
        .agg(F.count("*").alias("n"), F.round(F.avg("weight"), 4).alias("avg_weight"))
        .orderBy("predicate")
    )


def _kg_from_sources(spark, sf_dir):
    """Self-contained loop (rows-only): parse an inventory out of source
    text, link page mentions against it, add J9 call-graph edges."""
    import datetime

    from kgcompass_spark.pipeline import build_kg_from_sources

    src = (
        '"""mod."""\n\nclass Alpha:\n    def run_fast(self, v):\n'
        "        return helper_val(v)\n\ndef helper_val(v):\n    return v\n"
    )
    sources = spark.createDataFrame(
        [("demo/alpha.py", src)], "file_path string, source string"
    )
    pages = spark.createDataFrame(
        [
            (
                "https://t.example/issues/1",
                datetime.datetime(2020, 5, 1),
                None,
                "Crash in demo/alpha.py calling `demo.alpha.Alpha.run_fast` now.",
                "en",
            )
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = build_kg_from_sources(pages, sources)
    return (
        out["triples"]
        .groupBy("predicate")
        .agg(F.count("*").alias("n"))
        .orderBy("predicate")
    )


def _kg_core_links(spark, sf_dir):
    """The pipeline's HEART on a UDF-free slice, hash-checked: pages with
    pre-extracted text → the real M1/M2/M4 regex battery
    (``mentions_dataframe``) → the real fused dictionary join
    (``link_dictionary_mentions``) + the real J8 issue-ref join
    (``link_issue_refs``) → weighted links.

    Deterministic corpus from supplier×nation: page ``page/{sk}`` mentions
    its nation's file path (F slot, STRONG 0.25), its own method both as a
    dotted qualified name (Q slot, NORMAL 0.5) and a bare call (C slot —
    same link row, absorbed by the distinct), a ``helper{nk}()`` call whose
    short name is SHARED by a class and a decoy method (the C-slot
    min-struct winner rule picks the class), and ``#ref`` (ref = 3·sk mod
    100) to another page, kept only when that page exists, is not itself,
    and was crawled at or before the citing page (J8 leakage guard). Every
    piece is closed-form, so DuckDB replays the expected links exactly."""
    from kgcompass_spark.functions.mentions import mentions_dataframe
    from kgcompass_spark.operators.linking import (
        link_dictionary_mentions,
        link_issue_refs,
    )

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sk = F.col("s_suppkey").cast("string")
    snk = F.col("s_nationkey").cast("string")
    nk = F.col("n_nationkey").cast("string")
    ref = (F.col("s_suppkey") * 3 % 100).cast("string")
    base_ts = F.to_timestamp(F.lit("2023-01-01 00:00:00"))
    pages = s.select(
        F.concat(F.lit("page/"), sk).alias("url"),
        (base_ts + F.make_interval(mins=F.col("s_suppkey").cast("int"))).alias(
            "warc_ts"
        ),
        F.concat(
            F.lit("Error in src/n"), snk, F.lit(".py calling proc_"), sk,
            F.lit("() or helper"), snk, F.lit("() and mod"), snk,
            F.lit(".proc_"), sk, F.lit(" see #"), ref,
        ).alias("clean_text"),
        sk.alias("doc_key"),
    )
    entities = (
        n.select(
            F.concat(F.lit("file:n"), nk).alias("entity_id"),
            F.lit("file").alias("kind"),
            F.concat(F.lit("src/n"), nk, F.lit(".py")).alias("file_path"),
            F.lit(None).cast("string").alias("name"),
            F.lit(None).cast("string").alias("short_name"),
        )
        .unionByName(
            s.select(
                F.concat(F.lit("method:s"), sk).alias("entity_id"),
                F.lit("method").alias("kind"),
                F.concat(F.lit("src/n"), snk, F.lit(".py")).alias("file_path"),
                F.concat(F.lit("mod"), snk, F.lit(".proc_"), sk).alias("name"),
                F.concat(F.lit("proc_"), sk).alias("short_name"),
            )
        )
        .unionByName(
            n.select(
                F.concat(F.lit("class:c"), nk).alias("entity_id"),
                F.lit("class").alias("kind"),
                F.concat(F.lit("src/n"), nk, F.lit(".py")).alias("file_path"),
                F.concat(F.lit("Helper"), nk, F.lit("Cls")).alias("name"),
                F.concat(F.lit("helper"), nk).alias("short_name"),
            )
        )
        .unionByName(
            # decoy method sharing the class's short name: the C-slot
            # winner is min (entity_id, kind) — 'class:cN' < 'method:xN'
            n.select(
                F.concat(F.lit("method:x"), nk).alias("entity_id"),
                F.lit("method").alias("kind"),
                F.concat(F.lit("src/n"), nk, F.lit(".py")).alias("file_path"),
                F.concat(F.lit("zz"), nk).alias("name"),
                F.concat(F.lit("helper"), nk).alias("short_name"),
            )
        )
    )
    mentions = (
        mentions_dataframe(pages.select("url", "warc_ts", "clean_text"))
        .select("url", "warc_ts", F.explode("mentions").alias("m"))
        .select("url", "warc_ts", F.col("m.mtype").alias("mtype"),
                F.col("m.text").alias("text"))
    )
    dict_links = link_dictionary_mentions(mentions, entities)
    issue_links = link_issue_refs(
        mentions, pages.select("url", "warc_ts", "doc_key")
    )
    return (
        dict_links.unionByName(issue_links)
        .select("url", "entity_id", "kind", "weight")
        .distinct()
        .orderBy("url", "entity_id", "kind")
    )


def _kg_full_core(spark, sf_dir):
    """The FLAGSHIP composition (``build_kg`` with commits + docs — the same
    call kg_full_predicates runs), hash-checked end-to-end on a UDF-free
    corpus: documents become pages whose prose gets a constructed mention
    tail (file path + dotted qualified name + 'fix broken' repair tokens),
    parts become the entity inventory (method/class + file entities), the
    commit table (every 3rd message 'fix broken …', every 11th a merge) and
    the guide docs (every 7th referencing an unresolvable symbol).

    The oracle replays every stage in SQL: the mention battery's dict links
    (closed-form from the constructed tail), structural triples, the full
    context chain (tokenizer, eligibility regexes, leakage guard, top-20 /
    top-12(score≥3) / top-8 selections — build_kg's defaults, not the
    standalone entries' overrides), the collidable-vs-passthrough split,
    and the MERGE min-weight dedup that collapses the dict 0.5 link with
    the doc-multiplier 0.75 edge. Doc-node sha1 fragments are projected to
    ':h' on BOTH sides (multiplicities still compare exactly)."""
    from kgcompass_spark.pipeline import build_kg

    d = _t(spark, sf_dir, "documents")
    mstr = (((F.col("doc_id") % 20) + 1) * 10).cast("int").cast("string")
    pages = d.select(
        F.col("doc_id").cast("string").alias("url"),
        (
            F.lit("1996-01-01").cast("timestamp")
            + F.make_interval(days=(F.col("doc_id") % 1000).cast("int"))
        ).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.concat(
            F.col("text"),
            F.lit(" Crash in pkg/mod"), mstr,
            F.lit(".py calling pkg.mod.widget"), mstr,
            F.lit(" fix broken now."),
        ).alias("text"),
        F.lit("en").alias("lang"),
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    k = F.col("p_partkey").cast("string")
    kind = F.when(
        (F.col("p_partkey") / 10).cast("int") % 2 == 0, F.lit("method")
    ).otherwise(F.lit("class"))
    name = F.concat(F.lit("pkg.mod.widget"), k)
    fpath = F.concat(F.lit("pkg/mod"), k, F.lit(".py"))
    nullint = F.lit(None).cast("int")
    nullstr = F.lit(None).cast("string")
    entities = p.select(
        F.concat(kind, F.lit(":"), name, F.lit("@"), fpath).alias("entity_id"),
        kind.alias("kind"),
        fpath.alias("file_path"),
        name.alias("name"),
        F.concat(F.lit("widget"), k).alias("short_name"),
        nullint.alias("start_line"),
        nullint.alias("end_line"),
    ).unionByName(
        p.select(
            F.concat(F.lit("file:"), fpath).alias("entity_id"),
            F.lit("file").alias("kind"),
            fpath.alias("file_path"),
            nullstr.alias("name"),
            nullstr.alias("short_name"),
            nullint.alias("start_line"),
            nullint.alias("end_line"),
        )
    )
    base_msg = F.concat_ws(" ", "p_name", "p_type")
    commits = p.select(
        F.lpad(k, 7, "0").alias("commit_id"),
        F.when(
            F.col("p_partkey") % 3 == 0, F.concat(F.lit("fix broken "), base_msg)
        ).otherwise(base_msg).alias("message"),
        (
            F.lit("1995-06-01").cast("timestamp")
            + F.make_interval(days=(F.col("p_partkey") % 1460).cast("int"))
        ).alias("committed_ts"),
        F.array(F.lit("pkg/data_loader.py")).alias("changed_files"),
        F.array().cast(
            "array<struct<file_path:string,start_line:int,end_line:int>>"
        ).alias("changed_spans"),
        F.when(F.col("p_partkey") % 11 == 0, F.lit(2)).otherwise(F.lit(1)).alias(
            "n_parents"
        ),
    )
    sym = F.when(
        F.col("p_partkey") % 7 == 0, F.concat(F.lit("pkg.mod.nothing"), k)
    ).otherwise(name)
    docs = p.select(
        F.concat(F.lit("docs/guide"), k, F.lit(".md")).alias("doc_path"),
        F.concat(
            F.lit("guide for "), F.col("p_name"), F.lit(" "), F.col("p_type"),
            F.lit(" `"), sym, F.lit("`"),
        ).alias("text"),
    )
    out = build_kg(pages, entities, commits=commits, docs=docs)
    strip = lambda c: F.regexp_replace(c, r":[0-9a-f]{12}$", ":h")  # noqa: E731
    return out["triples"].select(
        strip(F.col("subj")).alias("subj"),
        "predicate",
        strip(F.col("obj")).alias("obj"),
        F.round("weight", 2).alias("weight"),
        "src_url",
    ).orderBy("subj", "predicate", "obj", "weight", "src_url")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # SQL-checked
        "a1_time_validity": _a1_time_validity,
        "a6_pricing_summary": _a6_pricing_summary,
        "t1_topk_orders": _t1_topk_orders,
        "t2_pertype_rank": _t2_pertype_rank,
        "t3_dedup_keepone": _t3_dedup_keepone,
        "j6_interval_join": _j6_interval_join,
        "j7_timewindow_join": _j7_timewindow_join,
        "j11_anti_join": _j11_anti_join,
        "u4_union_dedup": _u4_union_dedup,
        "p8_token_extract": _p8_token_extract,
        "p10_levenshtein": _p10_levenshtein,
        "p11_cosine_topk": _p11_cosine_topk,
        "dedup_exact_docs": _dedup_exact_docs,
        "text_stats": _text_stats,
        "repetition_signals_docs": _repetition_signals_docs,
        "gopher_filter_docs": _gopher_filter_docs,
        "pii_redaction_docs": _pii_redaction_docs,
        "canonical_urls": _canonical_urls,
        "text_distinct_ratio": _text_distinct_ratio,
        "lang_distribution": _lang_distribution,
        "a2_context_score": _a2_context_score,
        "a3_pattern_counts": _a3_pattern_counts,
        "u1_order_dedup_union": _u1_order_dedup_union,
        "g8_connected_components": _g8_connected_components,
        "g2_bfs_hops": _g2_bfs_hops,
        "g2b_bfs_multi_root": _g2b_bfs_multi_root,
        "evidence_export_batched": _evidence_export_batched,
        "evidence_paths_batched": _evidence_paths_batched,
        "context_commit_topk": _context_commit_topk,
        "context_repair_topk": _context_repair_topk,
        "context_docs_topk": _context_docs_topk,
        "g6_pagerank": _g6_pagerank,
        "a8_eval_summary": _a8_eval_summary,
        "ngram_jaccard_pairs": _ngram_jaccard_pairs,
        "ranked_related_fixture": _ranked_related_fixture,
        "ranked_sweep_fixture": _ranked_sweep_fixture,
        "result_documents_fixture": _result_documents_fixture,
        "lsh_alias_link": _lsh_alias_link,
        "lsh_canonical_map": _lsh_canonical_map,
        "kg_core_links": _kg_core_links,
        "kg_full_core": _kg_full_core,
        "contamination_docs": _contamination_docs,
        "domain_cap_docs": _domain_cap_docs,
        "hash_sample_docs": _hash_sample_docs,
        "minhash_near_dups": _minhash_near_dups,
        "simhash_docs": _simhash_docs,
        "fingerprint_docs": _fingerprint_docs,
        "detect_language_docs": _detect_language_docs,
        "lsh_cosine_topk": _lsh_cosine_topk,
        "ivf_cosine_topk": _ivf_cosine_topk,
        # tail: entries without a DuckDB oracle (ranked_related needs the
        # pluggable encoder UDF; the composites below are UDF-blocked) —
        # kept AFTER the 50 oracle-backed entries so the driver's 50-row
        # correctness window checks only oracle-verifiable queries
        "ranked_related": _ranked_related,
        "kg_pipeline_triples": _kg_pipeline_triples,
        "kg_full_predicates": _kg_full_predicates,
        "kg_from_sources_triples": _kg_from_sources,
        "result_documents": _result_documents,
    }


def _h60(expr: str) -> str:
    """DuckDB twin of functions.hashing.md5_60 (60-bit bigint from md5)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


# whitespace tokens, lowercased, empties dropped — DuckDB twin of the
# Spark `_tokens` / text_quality.tokens helpers
_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> len(t) > 0)"
)


def _build_lsh_alias_oracle(
    num_hashes: int = 16, bands: int = 4, ngram: int = 3, top_k: int = 3
) -> str:
    """DuckDB twin of _lsh_alias_link: normalize → char-3-gram → md5_60
    affine minhash → 4-band blocking join → exact distinct-gram Jaccard →
    top-3 per mention. The signature mins run over the RAW gram list
    (duplicates don't change a min); Jaccard runs over the distinct sets,
    exactly as the Spark operator does."""
    mersenne = (1 << 61) - 1
    rpb = num_hashes // bands

    def grams(col):
        return (
            f"CASE WHEN len({col}) < {ngram} THEN [{col}] "
            f"ELSE [substr({col}, i+1, {ngram}) "
            f"for i in generate_series(0, len({col}) - {ngram})] END"
        )

    sig_cols = ", ".join(
        f"list_min(list_transform(hh, h -> (h * {2 * i + 1} + {1_000_003 * (i + 1)}) "
        f"% {mersenne})) AS h{i}"
        for i in range(num_hashes)
    )

    def band_union(src):
        return " UNION ALL ".join(
            "SELECT ns, {i} AS band_id, {h} AS band_hash FROM {src}".format(
                i=i,
                src=src,
                h=_h60(
                    " || ',' || ".join(
                        f"h{i * rpb + j}::VARCHAR" for j in range(rpb)
                    )
                ),
            )
            for i in range(bands)
        )

    norm = "trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'))"
    return f"""
        WITH am AS (
          SELECT p_partkey::BIGINT AS entity_id, p_name AS alias,
                 {norm.format(c='p_name')} AS ns
          FROM part
        ),
        mm AS (
          SELECT 'm' || p_partkey::VARCHAR AS url,
                 regexp_replace(p_name, 'e', '', 'g') AS text,
                 {norm.format(c="regexp_replace(p_name, 'e', '', 'g')")} AS ns
          FROM part WHERE p_partkey % 7 = 1
        ),
        mg AS (SELECT ns, {grams('ns')} AS grams FROM (SELECT DISTINCT ns FROM mm)),
        ag AS (SELECT ns, {grams('ns')} AS grams FROM (SELECT DISTINCT ns FROM am)),
        mh AS (SELECT ns, list_transform(grams, g -> {_h60('g')} % 2147483647) AS hh FROM mg),
        ah AS (SELECT ns, list_transform(grams, g -> {_h60('g')} % 2147483647) AS hh FROM ag),
        msig AS (SELECT ns, {sig_cols} FROM mh),
        asig AS (SELECT ns, {sig_cols} FROM ah),
        mband AS ({band_union('msig')}),
        aband AS ({band_union('asig')}),
        pairs AS (
          SELECT mm.url, mm.text, am.entity_id, am.alias,
                 mm.ns AS m_ns, am.ns AS a_ns,
                 count(*) AS n_shared_bands
          FROM mm
          JOIN mband mb ON mb.ns = mm.ns
          JOIN aband ab ON ab.band_id = mb.band_id AND ab.band_hash = mb.band_hash
          JOIN am ON am.ns = ab.ns
          GROUP BY ALL
        ),
        jac AS (
          SELECT p.url, p.text, p.entity_id, p.alias, p.n_shared_bands,
                 len(list_intersect(list_distinct(g1.grams), list_distinct(g2.grams)))::DOUBLE
                   / len(list_distinct(list_concat(g1.grams, g2.grams))) AS jaccard
          FROM pairs p
          JOIN mg g1 ON g1.ns = p.m_ns
          JOIN ag g2 ON g2.ns = p.a_ns
        )
        SELECT url, text, entity_id, alias, n_shared_bands,
               round(jaccard, 6) AS jaccard, rank
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY url, text
            ORDER BY jaccard DESC, n_shared_bands DESC, entity_id, alias
          ) AS rank
          FROM jac
        ) WHERE rank <= {top_k}
    """


def _build_lsh_canon_oracle(
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold: float = 0.6,
    max_bucket: int = 256,
) -> str:
    """DuckDB twin of _lsh_canonical_map: the variant fixture, the same
    char-gram md5_60 minhash banding (incl. the mega-bucket star guard),
    exact-Jaccard >= threshold edges, and the union-find closure as a
    recursive-CTE reachability (comp = min reachable id) — exact at the
    sf0.01 cluster sizes this entry runs at."""
    mersenne = (1 << 61) - 1
    rpb = num_hashes // bands
    grams = (
        f"CASE WHEN len(ns) < {ngram} THEN [ns] "
        f"ELSE [substr(ns, i+1, {ngram}) "
        f"for i in generate_series(0, len(ns) - {ngram})] END"
    )
    sig_cols = ", ".join(
        f"list_min(list_transform(hh, h -> (h * {2 * i + 1} + {1_000_003 * (i + 1)}) "
        f"% {mersenne})) AS h{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT entity_id, {i} AS band_id, {h} AS band_hash FROM sig".format(
            i=i,
            h=_h60(
                " || ',' || ".join(f"h{i * rpb + j}::VARCHAR" for j in range(rpb))
            ),
        )
        for i in range(bands)
    )
    return f"""
        WITH RECURSIVE names AS (
          SELECT 'p' || lpad(p_partkey::VARCHAR, 7, '0') || ':a' AS entity_id,
                 p_name AS name FROM part WHERE p_partkey % 3 = 0
          UNION ALL
          SELECT 'p' || lpad(p_partkey::VARCHAR, 7, '0') || ':b',
                 replace(p_name, ' ', '_') FROM part WHERE p_partkey % 3 = 0
          UNION ALL
          SELECT 'p' || lpad(p_partkey::VARCHAR, 7, '0') || ':c',
                 regexp_replace(p_name, 'e', '', 'g') FROM part WHERE p_partkey % 3 = 0
        ),
        normd AS (
          SELECT entity_id,
                 trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')) AS ns
          FROM names
        ),
        gr AS (SELECT entity_id, list_distinct({grams}) AS grams, {grams} AS rawg FROM normd),
        hs AS (
          SELECT entity_id,
                 list_transform(rawg, g -> {_h60('g')} % 2147483647) AS hh
          FROM gr
        ),
        sig AS (SELECT entity_id, {sig_cols} FROM hs),
        banded AS ({band_selects}),
        stats AS (
          SELECT band_id, band_hash, count(*) AS bsize, min(entity_id) AS bmin
          FROM banded GROUP BY band_id, band_hash
        ),
        bd AS (
          SELECT b.entity_id, b.band_id, b.band_hash, s.bsize, s.bmin
          FROM banded b JOIN stats s USING (band_id, band_hash)
        ),
        cand AS (
          SELECT DISTINCT doc_a, doc_b FROM (
            SELECT a.entity_id AS doc_a, b.entity_id AS doc_b
            FROM bd a JOIN bd b
              ON a.band_id = b.band_id AND a.band_hash = b.band_hash
             AND a.entity_id < b.entity_id
            WHERE a.bsize <= {max_bucket}
            UNION ALL
            SELECT bmin AS doc_a, entity_id AS doc_b FROM bd
            WHERE bsize > {max_bucket} AND entity_id <> bmin
          )
        ),
        edges AS (
          SELECT doc_a AS src, doc_b AS dst
          FROM cand
          JOIN gr g1 ON g1.entity_id = cand.doc_a
          JOIN gr g2 ON g2.entity_id = cand.doc_b
          WHERE len(list_intersect(g1.grams, g2.grams))::DOUBLE
                  / len(list_distinct(list_concat(g1.grams, g2.grams)))
                >= {threshold}
        ),
        sym AS (
          SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
        ),
        reach(a, b) AS (
          SELECT entity_id, entity_id FROM names
          UNION
          SELECT r.a, e.dst FROM reach r JOIN sym e ON e.src = r.b
        )
        SELECT a AS entity_id, min(b) AS canonical_id FROM reach GROUP BY a
    """


def _build_minhash_oracle(
    num_hashes: int = 32, bands: int = 8, max_bucket: int = 256
) -> str:
    """DuckDB twin of minhash_signatures(hash_fn=md5_60) →
    minhash_lsh_candidates(hash_fn=md5_60) → n_shared_bands >= 2, including
    the mega-bucket star guard. Signature mins are list_min over the
    shingle list (Spark: explode + min aggregates — same values)."""
    mersenne = (1 << 61) - 1
    rows_per_band = num_hashes // bands
    sig_cols = ", ".join(
        f"list_min(list_transform(hh, h -> (h * {2 * i + 1} + {1_000_003 * (i + 1)}) "
        f"% {mersenne})) AS h{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {i} AS band_id, {h} AS band_hash FROM sig".format(
            i=i,
            h=_h60(
                " || ',' || ".join(
                    f"h{i * rows_per_band + j}::VARCHAR" for j in range(rows_per_band)
                )
            ),
        )
        for i in range(bands)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
        ),
        sh AS (
          SELECT doc_id,
            CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                 ELSE [array_to_string(tk[i+1:i+3], ' ')
                       for i in generate_series(0, len(tk) - 3)]
            END AS shingles
          FROM toks
        ),
        hs AS (
          SELECT doc_id,
                 list_transform(shingles, s -> {_h60('s')} % 2147483647) AS hh
          FROM sh
        ),
        sig AS (SELECT doc_id, {sig_cols} FROM hs),
        banded AS ({band_selects}),
        stats AS (
          SELECT band_id, band_hash, count(*) AS bsize, min(doc_id) AS bmin
          FROM banded GROUP BY band_id, band_hash
        ),
        bd AS (
          SELECT b.doc_id, b.band_id, b.band_hash, s.bsize, s.bmin
          FROM banded b JOIN stats s USING (band_id, band_hash)
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bd a JOIN bd b
            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
          WHERE a.bsize <= {max_bucket}
          UNION ALL
          SELECT bmin AS doc_a, doc_id AS doc_b FROM bd
          WHERE bsize > {max_bucket} AND doc_id <> bmin
        )
        SELECT doc_a, doc_b, count(*) AS n_shared_bands
        FROM pairs GROUP BY doc_a, doc_b
        HAVING count(*) >= 2
    """


def _build_simhash_oracle(bits: int = 60) -> str:
    """DuckDB twin of simhash(bits=60, hash_fn=md5_60): per-token md5_60,
    per-bit ±1 votes, positive-vote bits packed (h is non-negative, so
    shiftright == integer division — written as // here)."""
    votes = ", ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    pack = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits)
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
        ),
        h AS (SELECT doc_id, {_h60('tok')} AS h FROM toks),
        votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
        SELECT doc_id, ({pack})::BIGINT AS simhash FROM votes
    """


def _build_fingerprint_oracle(k: int = 8) -> str:
    """DuckDB twin of fingerprint(hash_fn=md5_60): token trigram md5_60
    hashes, k smallest ascending, md5_60 of their comma-joined decimals."""
    return f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
        ),
        tri AS (
          SELECT doc_id,
            CASE WHEN len(tk) < 3 THEN [{_h60("array_to_string(tk, ' ')")}]
                 ELSE [{_h60("array_to_string(tk[i+1:i+3], ' ')")}
                       for i in generate_series(0, len(tk) - 3)]
            END AS th
          FROM toks
        ),
        sm AS (SELECT doc_id, (list_sort(th))[1:{k}] AS sm FROM tri)
        SELECT doc_id,
               {_h60("array_to_string(list_transform(sm, x -> x::VARCHAR), ',')")} AS fp
        FROM sm
    """


def _build_lsh_topk_oracle(n_planes: int = 8, k: int = 10) -> str:
    """DuckDB twin of lsh_topk(hash_fn=md5_60): hyperplane sign sketch with
    md5_60-derived plane weights, multiprobe = query sketch + all 1-bit
    flips, exact cosine on the probed buckets. The dot product is a
    list_reduce left fold to match Spark's sequential aggregate exactly
    (0.0 + x1 + x2 … — the leading 0.0 is exact, so folds agree)."""

    def sketch(emb: str) -> str:
        plane_terms = []
        for p in range(n_planes):
            seed = f"'{p}_' || (d - 1)::VARCHAR"
            w = f"(({_h60(seed)} % 2000 - 1000)::DOUBLE / 1000.0)"
            dot = (
                f"list_reduce(list_prepend(0.0::DOUBLE, "
                f"list_transform(generate_series(1, len({emb})), "
                f"d -> {emb}[d]::DOUBLE * {w})), (acc, x) -> acc + x)"
            )
            plane_terms.append(f"CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END")
        return "(" + " + ".join(plane_terms) + ")"

    probe_list = ", ".join(
        ["qsketch"] + [f"xor(qsketch, {1 << p})" for p in range(n_planes)]
    )
    return f"""
        WITH b AS (
          SELECT vec_id, embedding, {sketch('embedding')} AS sketch
          FROM embeddings WHERE vec_id <> 0
        ),
        q AS (
          SELECT embedding AS qemb, {sketch('embedding')} AS qsketch
          FROM embeddings WHERE vec_id = 0
        ),
        probes AS (
          SELECT unnest([{probe_list}]) AS sketch, qemb FROM q
        ),
        scored AS (
          SELECT b.vec_id,
                 list_cosine_similarity(
                   list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                   list_transform(p.qemb, x -> CAST(x AS DOUBLE))) AS cos
          FROM b JOIN probes p USING (sketch)
        )
        SELECT vec_id,
               row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank,
               round(cos, 4) AS cos_sim
        FROM scored
        ORDER BY cos DESC, vec_id ASC
        LIMIT {k}
    """


def _rr_scored_ctes(decay: float = 0.6, w: float = 0.3) -> str:
    """Shared WITH-body for every fixture-KG oracle: candidates with
    closed-form SSSP costs (0.9 per hop on the 1-/2-hop frontier) scored
    by the cos×w + lev×(1−w) blend with decay^cost (issues: cos only) +
    identifier boosts, leaf-class and target-type filters applied."""
    root = _RR_ROOT_TEXT.replace("'", "''")
    root_low = _RR_ROOT_TEXT.lower().replace("'", "''")
    return f"""
        WITH emb AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        rootv AS (SELECT v FROM emb WHERE vec_id = 0),
        cand AS (
          SELECT 'method:s' || s_suppkey::VARCHAR AS node,
                 'method' AS entity_type, 1.8 AS cost, 2 AS hops,
                 'proc_' || s_suppkey::VARCHAR AS name,
                 'def proc_' || s_suppkey::VARCHAR || '(x)' AS signature,
                 'src/n' || s_nationkey::VARCHAR || '.py' AS file_path,
                 'proc_' || s_suppkey::VARCHAR || ' def proc_'
                   || s_suppkey::VARCHAR || '(x) ' || s_name AS ntext,
                 'n' || s_nationkey::VARCHAR || '.py' AS basename,
                 s_suppkey % 50 AS vec_id
          FROM supplier
          UNION ALL
          SELECT 'class:c' || n_nationkey::VARCHAR, 'class', 1.8, 2,
                 'Widget' || n_nationkey::VARCHAR,
                 NULL,
                 'src/n' || n_nationkey::VARCHAR || '.py',
                 'Widget' || n_nationkey::VARCHAR || ' class Widget'
                   || n_nationkey::VARCHAR || ' ' || n_name,
                 'n' || n_nationkey::VARCHAR || '.py',
                 (n_nationkey * 7 + 3) % 50
          FROM nation
          WHERE NOT (n_nationkey % 4 = 0 AND EXISTS
                     (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey))
          UNION ALL
          SELECT 'issue:i' || n_nationkey::VARCHAR, 'issue', 0.9, 1,
                 NULL, NULL, NULL, 'issue about ' || n_name, NULL,
                 (n_nationkey * 5 + 1) % 50
          FROM nation WHERE n_nationkey % 3 = 0
        ),
        scored AS (
          SELECT c.node, c.entity_type, c.cost, c.hops,
            c.name, c.signature, c.file_path,
            CASE WHEN c.entity_type = 'issue'
              THEN list_cosine_similarity(e.v, (SELECT v FROM rootv))
                   * power({decay}, c.cost)
              ELSE (list_cosine_similarity(e.v, (SELECT v FROM rootv)) * {w}
                    + (1.0 - levenshtein('{root}', c.ntext)::DOUBLE
                             / greatest(len('{root}'), len(c.ntext)))
                      * (1.0 - {w}))
                   * power({decay}, c.cost)
                   + CASE WHEN len(c.name) > 3
                           AND contains('{root_low}', lower(c.name))
                          THEN 0.2 ELSE 0.0 END
                   + CASE WHEN contains('{root_low}', lower(c.basename))
                          THEN 0.1 ELSE 0.0 END
            END AS sim
          FROM cand c JOIN emb e USING (vec_id)
        )
    """


def _build_ranked_related_oracle(
    decay: float = 0.6, w: float = 0.3, tag: str | None = None
) -> str:
    """DuckDB twin of _ranked_related_fixture (see ``_rr_scored_ctes`` for
    the shared candidate/scoring body). ``tag`` adds a param_tag column —
    one branch of the sweep oracle."""
    tag_col = f"'{tag}' AS param_tag, " if tag is not None else ""
    return f"""
        {_rr_scored_ctes(decay, w)}
        SELECT {tag_col}node, entity_type, round(sim, 4) AS similarity,
               round(cost, 4) AS distance, hops,
               row_number() OVER (PARTITION BY entity_type
                                  ORDER BY sim DESC, cost ASC, node ASC)
                 AS type_rank
        FROM scored
        QUALIFY type_rank <= 500
    """


def _build_result_docs_oracle(limit: int = 25) -> str:
    """DuckDB twin of _result_documents_fixture: the per-type top-``limit``
    candidates flattened back out of the assembled document — section,
    0-based array position, the reference entity-dict fields, and the root
    issue inserted at the head of the issues section with similarity 2.0 /
    distance 0 (knowledge_graph.py:1252-1262)."""
    root_title = "Root issue"
    return f"""
        {_rr_scored_ctes()}
        , ranked AS (
          SELECT *, row_number() OVER (PARTITION BY entity_type
                                       ORDER BY sim DESC, cost ASC, node ASC)
                    AS tr
          FROM scored
          QUALIFY tr <= {limit}
        )
        SELECT 'root' AS instance_id, 'method' AS section,
               tr - 1 AS pos, name, signature, file_path,
               NULL AS issue_id, round(sim, 4) AS similarity,
               round(cost, 4) AS distance, node AS graph_node_id
        FROM ranked WHERE entity_type = 'method'
        UNION ALL
        SELECT 'root', 'class', tr - 1, name, signature, file_path,
               NULL, round(sim, 4), round(cost, 4), node
        FROM ranked WHERE entity_type = 'class'
        UNION ALL
        SELECT 'root', 'issue', 0, '{root_title}', NULL, NULL,
               'root', 2.0, 0.0, 'issue:root'
        UNION ALL
        SELECT 'root', 'issue', tr,
               'issue about ' || n.n_name, NULL, NULL,
               'i' || n.n_nationkey::VARCHAR, round(r.sim, 4),
               round(r.cost, 4), r.node
        FROM ranked r JOIN nation n
          ON r.node = 'issue:i' || n.n_nationkey::VARCHAR
        WHERE r.entity_type = 'issue'
    """


def _build_ivf_oracle(n_cells: int = 16, n_probe: int = 4, k: int = 10) -> str:
    """DuckDB twin of ivf_topk(hash_fn=md5_60): centroids = the n_cells
    smallest md5_60(vec_id) base vectors, nearest-centroid assignment
    (cosine desc, cell asc), the query probes its n_probe nearest cells,
    exact cosine within probed cells, global top-k."""
    h = _h60("vec_id::VARCHAR")
    return f"""
        WITH emb AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        base AS (SELECT * FROM emb WHERE vec_id <> 0),
        q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
        cent AS (
          SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cell, v AS cvec
          FROM (
            SELECT vec_id, v, {h} AS h FROM base ORDER BY h, vec_id LIMIT {n_cells}
          )
        ),
        assigned AS (
          SELECT vec_id, v, cell FROM (
            SELECT b.vec_id, b.v, c.cell,
                   row_number() OVER (
                     PARTITION BY b.vec_id
                     ORDER BY list_cosine_similarity(b.v, c.cvec) DESC, c.cell ASC
                   ) AS rn
            FROM base b CROSS JOIN cent c
          ) WHERE rn = 1
        ),
        qc AS (
          SELECT cell, qv FROM (
            SELECT c.cell, q.qv,
                   row_number() OVER (
                     ORDER BY list_cosine_similarity(q.qv, c.cvec) DESC, c.cell ASC
                   ) AS rn
            FROM q CROSS JOIN cent c
          ) WHERE rn <= {n_probe}
        ),
        scored AS (
          SELECT a.vec_id, list_cosine_similarity(a.v, p.qv) AS cos
          FROM assigned a JOIN qc p USING (cell)
        )
        SELECT vec_id,
               row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank,
               round(cos, 4) AS cos_sim
        FROM scored
        ORDER BY cos DESC, vec_id ASC
        LIMIT {k}
    """


def _build_ranked_sweep_oracle() -> str:
    """Sweep oracle: the parameterized fixture SELECT once per
    (tag, decay, w) pair, UNION ALL — per-branch windows are equivalent to
    the sweep's (param_tag, root, type) window on a single-root fixture."""
    return "\nUNION ALL\n".join(
        f"SELECT * FROM ({_build_ranked_related_oracle(d, w, tag=t)})"
        for (t, d, w) in _SWEEP_PARAMS
    )


def _build_pagerank_oracle(iters: int = 12) -> str:
    """Unrolled power iteration for the g6 entry: rank_{t+1}(v) =
    0.15·base(v) + 0.85·Σ_{u→v} rank_t(u)/outdeg(u), max-normalized —
    one CTE pair per iteration (DuckDB recursive CTEs disallow the
    aggregate in the recursive term, so the fixed iteration count is
    unrolled instead)."""
    edges = (
        "SELECT 'region:' || n_regionkey AS src, 'nation:' || n_nationkey AS dst FROM nation "
        "UNION ALL "
        "SELECT 'nation:' || s_nationkey AS src, 'supplier:' || s_suppkey AS dst FROM supplier"
    )
    parts = [
        f"WITH e AS ({edges}),",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),",
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),",
        "base AS (SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS base FROM nodes),",
        "r0 AS (SELECT node, base AS rank FROM base),",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, sum(r.rank / d.deg) AS inflow "
            f"FROM r{i} r JOIN e ON e.src = r.node JOIN deg d ON d.src = e.src "
            f"GROUP BY e.dst),"
        )
        parts.append(
            f"r{i + 1} AS (SELECT b.node, 0.15 * b.base + 0.85 * coalesce(c.inflow, 0) AS rank "
            f"FROM base b LEFT JOIN c{i} c ON c.node = b.node),"
        )
    parts.append(f"mx AS (SELECT max(rank) AS m FROM r{iters})")
    parts.append(
        f"SELECT node, round(rank / (SELECT m FROM mx), 6) AS score FROM r{iters}"
    )
    return "\n".join(parts)


def oracle_sql() -> dict[str, str]:
    return {
        "a1_time_validity": """
            SELECT
              count(DISTINCT CASE WHEN ts <= TIMESTAMP '2024-01-15 00:00:00' THEN event_id END) AS valid_cnt,
              count(DISTINCT CASE WHEN ts >  TIMESTAMP '2024-01-15 00:00:00' THEN event_id END) AS skipped_cnt
            FROM events
        """,
        "a6_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2)      AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "t1_topk_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS price
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 100
        """,
        "t2_pertype_rank": """
            SELECT o_orderpriority, rnk, o_orderkey, price FROM (
              SELECT o_orderpriority,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
                     o_orderkey, round(o_totalprice, 2) AS price
              FROM orders
            ) WHERE rnk <= 5
        """,
        "t3_dedup_keepone": """
            SELECT o_custkey, latest_orderkey FROM (
              SELECT o_custkey, o_orderkey AS latest_orderkey,
                     row_number() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey ASC) AS rn
              FROM orders
            ) WHERE rn = 1
        """,
        "j6_interval_join": """
            SELECT o_orderpriority,
                   count(*) AS n_items,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= o_orderdate
              AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
            GROUP BY o_orderpriority
        """,
        "j7_timewindow_join": """
            SELECT e.event_id AS err_id,
                   count(c.clk_ts) AS n_prior_clicks
            FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
            LEFT JOIN (SELECT user_id, ts AS clk_ts FROM events WHERE event_type = 'click') c
              ON e.user_id = c.user_id
             AND c.clk_ts >= e.ts - INTERVAL 1 HOUR
             AND c.clk_ts <  e.ts
            GROUP BY e.event_id
        """,
        "j11_anti_join": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment
        """,
        "u4_union_dedup": """
            SELECT nationkey, count(*) AS n_refs FROM (
              SELECT c_nationkey AS nationkey FROM customer
              UNION ALL
              SELECT s_nationkey AS nationkey FROM supplier
            ) GROUP BY nationkey
        """,
        "p8_token_extract": """
            SELECT token, count(*) AS freq FROM (
              SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents
            ) WHERE len(token) > 0
            GROUP BY token
            ORDER BY freq DESC, token ASC
            LIMIT 20
        """,
        "p10_levenshtein": """
            SELECT c_custkey,
                   round(1.0 - levenshtein(c_name, 'Customer#000000001')
                         / greatest(length(c_name), length('Customer#000000001'))::DOUBLE, 4) AS lev_sim
            FROM customer WHERE c_custkey <= 100
        """,
        "p11_cosine_topk": """
            WITH q AS (
              SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
              FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
              SELECT e.vec_id,
                     list_cosine_similarity(
                       list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv) AS cos
              FROM embeddings e, q
              WHERE e.vec_id <> 0
            )
            SELECT vec_id,
                   row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS rank,
                   round(cos, 4) AS cos_sim
            FROM scored
            ORDER BY cos DESC, vec_id ASC
            LIMIT 10
        """,
        "dedup_exact_docs": """
            SELECT md5(text) AS content_hash,
                   count(*) AS dup_count,
                   min(doc_id) AS keeper_id
            FROM documents
            GROUP BY md5(text)
        """,
        "gopher_filter_docs": r"""
            WITH base AS (
              SELECT doc_id,
                     (CASE WHEN doc_id % 2 = 0 THEN text || ' ' || text
                           ELSE text END)
                     || (CASE WHEN doc_id % 3 = 0
                              THEN ' and of to that be have' ELSE '' END) AS t
              FROM documents
            ),
            wstats AS (
              SELECT doc_id, t, len(t) AS tlen,
                     list_filter(regexp_split_to_array(lower(t), '\s+'),
                                 s -> len(s) > 0) AS tk
              FROM base
            ),
            wagg AS (
              SELECT doc_id, tlen,
                     len(tk) AS n_words,
                     CASE WHEN len(tk) > 0
                          THEN list_sum(list_transform(tk, x -> len(x)))
                               * 1.0 / len(tk) ELSE 0 END AS mean_len,
                     CASE WHEN len(tk) > 0
                          THEN len(regexp_extract_all(t, '(#|\.\.\.)'))
                               * 1.0 / len(tk) ELSE 0 END AS sym_ratio,
                     CASE WHEN len(tk) > 0
                          THEN len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))
                               * 1.0 / len(tk) ELSE 0 END AS alpha_frac,
                     len(list_intersect(list_distinct(tk),
                         ['the','be','to','of','and','that','have','with'])) AS n_stop,
                     list_filter(string_split(t, chr(10)),
                                 s -> len(trim(s)) > 0) AS lns
              FROM wstats
            ),
            lagg AS (
              SELECT doc_id,
                     len(lns) AS n_lines,
                     CASE WHEN len(lns) > 0
                          THEN len(list_filter(lns, x -> regexp_matches(trim(x), '^([-*•])')))
                               * 1.0 / len(lns) ELSE 0 END AS bullet_frac,
                     CASE WHEN len(lns) > 0
                          THEN len(list_filter(lns, x -> regexp_matches(trim(x), '(\.\.\.|…)$')))
                               * 1.0 / len(lns) ELSE 0 END AS ellipsis_frac,
                     CASE WHEN len(lns) > 0
                          THEN round((len(lns) - len(list_distinct(lns))) * 1.0
                                     / len(lns), 6) ELSE 0 END AS dup_line_frac,
                     CASE WHEN list_sum(list_transform(lns, x -> len(x))) > 0
                          THEN round(coalesce((
                                 SELECT sum(c * ll) FROM (
                                   SELECT line, count(*) AS c, len(line) AS ll
                                   FROM unnest(lns) AS u(line) GROUP BY line
                                 ) WHERE c > 1), 0) * 1.0
                               / list_sum(list_transform(lns, x -> len(x))), 6)
                          ELSE 0 END AS dup_line_char_frac
              FROM wagg
            ),
            grams AS (
              SELECT doc_id, tlen, k, gram FROM (
                SELECT w.doc_id, w.tlen, k.k AS k,
                       CASE WHEN len(w.tk) < k.k
                            THEN [array_to_string(w.tk, ' ')]
                            ELSE list_transform(
                                   generate_series(1, len(w.tk) - k.k + 1),
                                   i -> array_to_string(w.tk[i:i+k.k-1], ' '))
                       END AS gs
                FROM wstats w CROSS JOIN (VALUES (2), (3), (4)) AS k(k)
              ), unnest(gs) AS g(gram)
            ),
            topg AS (
              SELECT doc_id, k,
                     round(cnt * len(gram) * 1.0 / tlen, 6) AS frac
              FROM (
                SELECT doc_id, k, gram, tlen, count(*) AS cnt,
                       row_number() OVER (PARTITION BY doc_id, k
                                          ORDER BY count(*) DESC, gram ASC) AS rn
                FROM grams GROUP BY doc_id, k, gram, tlen
              ) WHERE rn = 1
            ),
            tf AS (
              SELECT doc_id,
                     max(CASE WHEN k = 2 THEN frac END) AS top2,
                     max(CASE WHEN k = 3 THEN frac END) AS top3,
                     max(CASE WHEN k = 4 THEN frac END) AS top4
              FROM topg GROUP BY doc_id
            ),
            judged AS (
              SELECT w.doc_id,
                     CASE WHEN w.n_words < 50 OR w.n_words > 100000 THEN 'word_count'
                          WHEN w.mean_len < 3 OR w.mean_len > 10 THEN 'mean_word_len'
                          WHEN w.sym_ratio > 0.1 THEN 'symbol_ratio'
                          WHEN l.bullet_frac > 0.9 THEN 'bullet_lines'
                          WHEN l.ellipsis_frac > 0.3 THEN 'ellipsis_lines'
                          WHEN w.alpha_frac < 0.8 THEN 'alpha_words'
                          WHEN w.n_stop < 2 THEN 'stopwords'
                          WHEN l.dup_line_frac > 0.30 THEN 'dup_line_frac'
                          WHEN l.dup_line_char_frac > 0.20 THEN 'dup_line_char_frac'
                          WHEN t.top2 > 0.20 THEN 'top2_char_frac'
                          WHEN t.top3 > 0.18 THEN 'top3_char_frac'
                          WHEN t.top4 > 0.16 THEN 'top4_char_frac'
                          ELSE NULL END AS reason
              FROM wagg w JOIN lagg l USING (doc_id) JOIN tf t USING (doc_id)
            )
            SELECT doc_id, reason IS NULL AS keep, reason FROM judged
        """,
        "pii_redaction_docs": r"""
            SELECT doc_id,
                   md5(text || ' contact <EMAIL> or call <PHONE> from <IP> now')
                     AS redacted_md5,
                   1 AS n_emails, 1 AS n_ips, 1 AS n_phones
            FROM documents
        """,
        "canonical_urls": r"""
            SELECT doc_id,
                   CASE WHEN doc_id % 10 = 9
                        THEN 'not a url ' || CAST(doc_id AS VARCHAR)
                        ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR)
                             || '.com/a/b' || CAST(doc_id % 9 AS VARCHAR)
                             || '?id=' || CAST(doc_id % 77 AS VARCHAR)
                             || '&q=' || CAST(doc_id % 5 AS VARCHAR)
                   END AS canonical_url
            FROM documents
        """,
        "repetition_signals_docs": r"""
            WITH base AS (
              SELECT doc_id,
                     regexp_replace(text, ' table ', chr(10), 'g') AS t
              FROM documents
            ),
            lns AS (
              SELECT doc_id, u.x AS line
              FROM base,
                   unnest(list_filter(string_split(t, chr(10)),
                                      s -> len(trim(s)) > 0)) AS u(x)
            ),
            lstats AS (
              SELECT doc_id, count(*) AS n_lines,
                     count(DISTINCT line) AS n_dist,
                     sum(len(line)) AS tot_chars
              FROM lns GROUP BY doc_id
            ),
            lgrp AS (
              SELECT doc_id, line, count(*) AS c, len(line) AS ll
              FROM lns GROUP BY doc_id, line
            ),
            dupc AS (
              SELECT doc_id,
                     sum(CASE WHEN c > 1 THEN c * ll ELSE 0 END) AS dup_chars
              FROM lgrp GROUP BY doc_id
            ),
            toks AS (
              SELECT doc_id, len(t) AS tlen,
                     list_filter(regexp_split_to_array(lower(t), '\s+'),
                                 s -> len(s) > 0) AS tk
              FROM base
            ),
            grams AS (
              SELECT doc_id, tlen, k, gram FROM (
                SELECT doc_id, tlen, k.k AS k,
                       CASE WHEN len(tk) < k.k
                            THEN [array_to_string(tk, ' ')]
                            ELSE list_transform(
                                   generate_series(1, len(tk) - k.k + 1),
                                   i -> array_to_string(tk[i:i+k.k-1], ' '))
                       END AS gs
                FROM toks CROSS JOIN (VALUES (2), (3), (4)) AS k(k)
              ), unnest(gs) AS g(gram)
            ),
            topg AS (
              SELECT doc_id, k, gram, cnt, tlen FROM (
                SELECT doc_id, k, gram, tlen, count(*) AS cnt,
                       row_number() OVER (PARTITION BY doc_id, k
                                          ORDER BY count(*) DESC, gram ASC) AS rn
                FROM grams GROUP BY doc_id, k, gram, tlen
              ) WHERE rn = 1
            ),
            fr AS (
              SELECT doc_id,
                     max(CASE WHEN k = 2 THEN round(cnt * len(gram) / tlen, 6) END) AS top2_char_frac,
                     max(CASE WHEN k = 3 THEN round(cnt * len(gram) / tlen, 6) END) AS top3_char_frac,
                     max(CASE WHEN k = 4 THEN round(cnt * len(gram) / tlen, 6) END) AS top4_char_frac
              FROM topg GROUP BY doc_id
            )
            SELECT l.doc_id, l.n_lines,
                   round((l.n_lines - l.n_dist) * 1.0 / l.n_lines, 6) AS dup_line_frac,
                   round(d.dup_chars * 1.0 / l.tot_chars, 6) AS dup_line_char_frac,
                   f.top2_char_frac, f.top3_char_frac, f.top4_char_frac
            FROM lstats l
            JOIN dupc d USING (doc_id)
            JOIN fr f USING (doc_id)
        """,
        "text_stats": """
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'), t -> len(t) > 0)) AS n_tokens,
                   length(text) AS n_chars_actual
            FROM documents
        """,
        "text_distinct_ratio": """
            SELECT doc_id,
                   round(
                     len(list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> len(t) > 0)))::DOUBLE
                     / len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> len(t) > 0)),
                   4) AS distinct_ratio
            FROM documents
        """,
        "lang_distribution": """
            -- CAST: DuckDB sum(int) is HUGEINT; Spark returns BIGINT — align types
            SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        """,
        "detect_language_docs": """
            -- n-gram-marker language ID: distinct-token intersection per
            -- marker set, argmax with the lexicographic-max-lang tie-break
            -- of Spark's array_max over (hits, lang) structs
            WITH t AS (
              SELECT doc_id,
                     list_distinct(list_filter(
                       regexp_split_to_array(lower(text), '\\s+'),
                       x -> len(x) > 0)) AS tk
              FROM documents
            ),
            h AS (
              SELECT doc_id,
                len(list_intersect(tk, ['the','and','of','to','is','in','that','it','for','with'])) AS en,
                len(list_intersect(tk, ['der','die','das','und','ist','nicht','ein','mit','für'])) AS de,
                len(list_intersect(tk, ['le','la','les','et','est','une','pour','dans','que'])) AS fr,
                len(list_intersect(tk, ['el','la','los','las','es','una','para','con','que'])) AS es
              FROM t
            )
            SELECT doc_id,
                   CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                        WHEN fr = greatest(en, de, fr, es) THEN 'fr'
                        WHEN es = greatest(en, de, fr, es) THEN 'es'
                        WHEN en = greatest(en, de, fr, es) THEN 'en'
                        ELSE 'de'
                   END AS detected
            FROM h
        """,
        "a2_context_score": """
            SELECT doc_id,
                   len(list_intersect(
                     list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> len(t) > 0)),
                     ['table', 'join', 'spark', 'query'])) AS context_score
            FROM documents
        """,
        "a3_pattern_counts": """
            SELECT
              CAST(sum(CASE WHEN regexp_matches(text, '\\btable\\b') THEN 1 ELSE 0 END) AS BIGINT) AS has_table,
              CAST(sum(CASE WHEN regexp_matches(text, '\\bjoin\\b') THEN 1 ELSE 0 END) AS BIGINT) AS has_join,
              CAST(sum(CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END) AS BIGINT) AS has_digit
            FROM documents
        """,
        "u1_order_dedup_union": """
            SELECT o_orderpriority, count(*) AS n_pairs FROM (
              SELECT DISTINCT o_custkey, o_orderpriority FROM (
                SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
              )
            ) GROUP BY o_orderpriority
        """,
        "g8_connected_components": """
            SELECT o_orderkey,
                   min(o_orderkey) OVER (PARTITION BY o_custkey) AS component
            FROM orders
        """,
        "g2b_bfs_multi_root": """
            WITH RECURSIVE bfs(root, node, hops) AS (
              SELECT 'region:' || r_regionkey, 'region:' || r_regionkey, 0 FROM region
              UNION ALL
              SELECT bfs.root, e.obj, bfs.hops + 1 FROM bfs JOIN (
                SELECT 'region:' || n_regionkey AS subj, 'nation:' || n_nationkey AS obj FROM nation
                UNION ALL
                SELECT 'nation:' || c_nationkey AS subj, 'customer:' || c_custkey AS obj FROM customer
              ) e ON e.subj = bfs.node
              WHERE bfs.hops < 2
            )
            SELECT root, node, min(hops) AS hops FROM bfs GROUP BY root, node
        """,
        "g6_pagerank": _build_pagerank_oracle(12),
        "context_commit_topk": r"""
            WITH iss AS (
              SELECT CAST(doc_id AS VARCHAR) AS url,
                     TIMESTAMP '1996-01-01'
                       + (doc_id % 1000) * INTERVAL 1 DAY AS warc_ts,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(lower(text), '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(text), '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM documents
            ),
            com AS (
              SELECT lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS cid,
                     TIMESTAMP '1995-06-01'
                       + (p_partkey % 1460) * INTERVAL 1 DAY AS cts,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(
                           lower(p_name || ' ' || p_type || chr(10) || 'pkg/data_loader.py'),
                           '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(p_name || ' ' || p_type), '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM part
              WHERE p_partkey % 10 = 0
                AND p_partkey % 11 <> 0
                AND NOT regexp_matches(split_part(p_name || ' ' || p_type, chr(10), 1),
                  '(?i)\b(pyupgrade|pre-commit|precommit|black|isort|ruff|flake8|pylint|format(?:ting)?|style|lint|whitespace|typo|spelling|docstring|sphinx|warning|codestyle|D\d{3,4}|B\d{3,4}|SIM\d{3,4}|RUF\d{3,4}|E\d{3,4}|W\d{3,4}|F\d{3,4}|dependabot|bump|changelog|release notes)\b')
            ),
            pairs AS (
              SELECT i.url, c.cid, c.cts,
                     len(list_intersect(i.toks, c.toks)) AS score
              FROM iss i CROSS JOIN com c
              WHERE c.cts <= i.warc_ts
            ),
            sel AS (
              SELECT url, cid FROM (
                SELECT url, cid,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY score DESC, cts DESC, cid ASC) AS rn
                FROM pairs WHERE score > 0
              ) WHERE rn <= 5
            )
            SELECT 'issue:' || url AS subj, 'points to commit' AS predicate,
                   'commit:' || cid AS obj, CAST(0.5 AS DOUBLE) AS weight,
                   url AS src_url
            FROM sel
            UNION ALL
            SELECT DISTINCT 'commit:' || cid, 'modified file',
                   'file:pkg/data_loader.py', CAST(0.5 AS DOUBLE), ''
            FROM sel
        """,
        "evidence_export_batched": """
            WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
            home AS (SELECT l_partkey, min(l_suppkey) AS home FROM pairs GROUP BY l_partkey),
            named AS (
              SELECT l_partkey, home,
                     CASE WHEN l_partkey % 26 = 0
                            THEN 'pytest_p' || lpad(CAST(l_partkey AS VARCHAR), 7, '0')
                          WHEN l_partkey % 13 = 0
                            THEN 'latest_p' || lpad(CAST(l_partkey AS VARCHAR), 7, '0')
                          ELSE 'p' || lpad(CAST(l_partkey AS VARCHAR), 7, '0')
                     END AS name
              FROM home
            ),
            reach AS (
              SELECT s.s_nationkey AS nk, p.l_partkey AS pk,
                     count(DISTINCT p.l_suppkey) AS support,
                     min(p.l_suppkey) AS minsup
              FROM pairs p JOIN supplier s ON s.s_suppkey = p.l_suppkey
              GROUP BY 1, 2
            ),
            cand AS (
              SELECT 'issue:' || lpad(CAST(r.nk AS VARCHAR), 2, '0') AS root,
                     'method:' || n.name || '@s'
                       || lpad(CAST(n.home AS VARCHAR), 6, '0') AS node,
                     'method' AS entity_type,
                     n.name AS name,
                     's' || lpad(CAST(n.home AS VARCHAR), 6, '0') AS file_path,
                     2 AS distance,
                     r.support AS support,
                     (r.minsup = n.home) AS anchor
              FROM reach r JOIN named n ON n.l_partkey = r.pk
              WHERE NOT contains(n.name, 'test') OR contains(n.name, 'pytest')
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY root
                       ORDER BY support DESC, distance ASC, anchor DESC,
                                file_path ASC, name ASC, node ASC
                     ) AS rank
              FROM cand
            )
            SELECT root, node, entity_type, name, file_path, distance,
                   support, anchor, rank,
                   row_number() OVER (PARTITION BY root, entity_type
                                      ORDER BY rank) AS type_rank
            FROM ranked
            QUALIFY type_rank <= 50
        """,
        "evidence_paths_batched": """
            WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
            home AS (SELECT l_partkey, min(l_suppkey) AS home FROM pairs GROUP BY l_partkey),
            nsup AS (
              SELECT s.s_nationkey AS nk, p.l_partkey AS pk, p.l_suppkey AS sk,
                     row_number() OVER (PARTITION BY s.s_nationkey, p.l_partkey
                                        ORDER BY p.l_suppkey) AS srk
              FROM pairs p JOIN supplier s ON s.s_suppkey = p.l_suppkey
            ),
            reach AS (
              SELECT nk, pk,
                     count(*) AS support,
                     min(CASE WHEN srk = 1 THEN sk END) AS minsup,
                     min(CASE WHEN srk = 2 THEN sk END) AS secsup
              FROM nsup GROUP BY nk, pk
            ),
            cand AS (
              SELECT 'issue:' || lpad(CAST(r.nk AS VARCHAR), 2, '0') AS root,
                     'method:p' || lpad(CAST(r.pk AS VARCHAR), 7, '0') || '@s'
                       || lpad(CAST(h.home AS VARCHAR), 6, '0') AS node,
                     r.support AS support,
                     least(4, r.support) AS n_paths,
                     'file:s' || lpad(CAST(r.minsup AS VARCHAR), 6, '0') AS first_seed,
                     CASE WHEN r.secsup IS NULL THEN NULL
                          ELSE 'file:s' || lpad(CAST(r.secsup AS VARCHAR), 6, '0')
                     END AS second_seed,
                     'points to file' AS p1_pred,
                     'contains method in file' AS p2_pred,
                     (r.minsup = h.home) AS anchor,
                     's' || lpad(CAST(h.home AS VARCHAR), 6, '0') AS file_path,
                     'p' || lpad(CAST(r.pk AS VARCHAR), 7, '0') AS name
              FROM reach r JOIN home h ON h.l_partkey = r.pk
            ),
            ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY root
                       ORDER BY support DESC, anchor DESC,
                                file_path ASC, name ASC, node ASC
                     ) AS type_rank
              FROM cand
            )
            SELECT root, node, support, n_paths, first_seed, second_seed,
                   p1_pred, p2_pred
            FROM ranked
            WHERE type_rank <= 50
        """,
        "context_repair_topk": r"""
            WITH iss AS (
              SELECT CAST(doc_id AS VARCHAR) AS url,
                     TIMESTAMP '1996-01-01'
                       + (doc_id % 1000) * INTERVAL 1 DAY AS warc_ts,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(lower(text), '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(text), '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM documents
            ),
            msgs AS (
              SELECT p_partkey,
                     CASE WHEN p_partkey % 3 = 0
                          THEN 'fix broken ' || p_name || ' ' || p_type
                          ELSE p_name || ' ' || p_type END AS msg
              FROM part WHERE p_partkey % 10 = 0
            ),
            com AS (
              SELECT lpad(CAST(p_partkey AS VARCHAR), 7, '0') AS cid,
                     TIMESTAMP '1995-06-01'
                       + (p_partkey % 1460) * INTERVAL 1 DAY AS cts,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(
                           lower(msg || chr(10) || 'pkg/data_loader.py'),
                           '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(msg), '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM msgs
              WHERE p_partkey % 11 <> 0
                AND NOT regexp_matches(split_part(msg, chr(10), 1),
                  '(?i)\b(pyupgrade|pre-commit|precommit|black|isort|ruff|flake8|pylint|format(?:ting)?|style|lint|whitespace|typo|spelling|docstring|sphinx|warning|codestyle|D\d{3,4}|B\d{3,4}|SIM\d{3,4}|RUF\d{3,4}|E\d{3,4}|W\d{3,4}|F\d{3,4}|dependabot|bump|changelog|release notes)\b')
                AND regexp_matches(msg,
                  '(?i)\b(fix(?:e[sd])?|bug(?:fix)?|error|fail(?:ed|s|ure)?|regression|incorrect(?:ly)?|wrong|crash(?:es|ed)?|exception|broken|repair|resolve(?:[sd])?|invalid)\b')
            ),
            pairs AS (
              SELECT i.url, c.cid, c.cts,
                     len(list_intersect(i.toks, c.toks)) AS score
              FROM iss i CROSS JOIN com c
              WHERE c.cts <= i.warc_ts
            ),
            sel AS (
              SELECT url, cid FROM (
                SELECT url, cid,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY score DESC, cts DESC, cid ASC) AS rn
                FROM pairs WHERE score >= 1
              ) WHERE rn <= 12
            )
            SELECT 'issue:' || url AS subj,
                   'points to repair experience' AS predicate,
                   'repair:' || cid AS obj, CAST(0.25 AS DOUBLE) AS weight,
                   url AS src_url
            FROM sel
            UNION ALL
            SELECT DISTINCT 'repair:' || cid, 'mentions file',
                   'file:pkg/data_loader.py', CAST(0.5 AS DOUBLE), ''
            FROM sel
        """,
        "context_docs_topk": r"""
            WITH iss AS (
              SELECT CAST(doc_id AS VARCHAR) AS url,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(lower(text), '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(text), '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM documents
            ),
            docs AS (
              SELECT p_partkey AS k,
                     'docs/guide' || CAST(p_partkey AS VARCHAR) || '.md' AS doc_path,
                     'guide for ' || p_name || ' ' || p_type || ' `'
                       || CASE WHEN p_partkey % 7 = 0
                               THEN 'pkg.mod.nothing' || CAST(p_partkey AS VARCHAR)
                               ELSE 'pkg.mod.widget' || CAST(p_partkey AS VARCHAR) END
                       || '`' AS text,
                     (p_partkey % 7 <> 0) AS resolves,
                     CASE WHEN p_partkey % 2 = 0 THEN 'method' ELSE 'class' END AS kind,
                     'pkg.mod.widget' || CAST(p_partkey AS VARCHAR) AS ename,
                     'pkg/mod' || CAST(p_partkey AS VARCHAR) || '.py' AS fpath
              FROM part WHERE p_partkey % 10 = 0
            ),
            dtok AS (
              SELECT k, doc_path, resolves, kind, ename, fpath,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(lower(doc_path || chr(10) || text),
                                            '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(doc_path || chr(10) || text),
                                          '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM docs
            ),
            sel AS (
              SELECT url, k, doc_path, resolves, kind, ename, fpath FROM (
                SELECT i.url, d.k, d.doc_path, d.resolves, d.kind, d.ename, d.fpath,
                       row_number() OVER (
                         PARTITION BY i.url
                         ORDER BY len(list_intersect(i.toks, d.toks)) DESC,
                                  d.doc_path ASC
                       ) AS rn
                FROM iss i CROSS JOIN dtok d
                WHERE len(list_intersect(i.toks, d.toks)) > 0
              ) WHERE rn <= 8
            )
            SELECT 'issue:' || url AS subj,
                   'points to documentation' AS predicate,
                   'doc:' || url || ':h' AS obj,
                   CAST(0.5 AS DOUBLE) AS weight, url AS src_url
            FROM sel WHERE resolves
            UNION ALL
            SELECT 'doc:' || url || ':h', 'mentions file by documentation',
                   'file:' || fpath, CAST(0.5 AS DOUBLE), ''
            FROM sel WHERE resolves
            UNION ALL
            SELECT DISTINCT 'issue:' || url,
                   CASE WHEN kind = 'class' THEN 'points to class'
                        ELSE 'points to method' END,
                   kind || ':' || ename || '@' || fpath,
                   CAST(0.75 AS DOUBLE), url
            FROM sel WHERE resolves
        """,
        "ngram_jaccard_pairs": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> len(t) > 0) AS tk
              FROM documents
            ),
            sh AS (
              SELECT doc_id,
                     CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                          ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                     END AS sh
              FROM toks
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   round(len(list_intersect(a.sh, b.sh))::DOUBLE
                         / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
        """,
        "a8_eval_summary": """
            WITH insts AS (SELECT o_orderkey AS instance_id FROM orders WHERE o_orderkey % 32 = 0),
            base AS (SELECT i.instance_id, l.* FROM lineitem l JOIN insts i ON l.l_orderkey = i.instance_id),
            preds AS (SELECT instance_id, CAST(l_partkey AS VARCHAR) AS signature,
                             'f/' || CAST(l_partkey AS VARCHAR) AS file_path,
                             row_number() OVER (PARTITION BY instance_id
                                                ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rnk
                      FROM base),
            gt_e AS (SELECT DISTINCT instance_id, CAST(l_partkey AS VARCHAR) AS signature
                     FROM base WHERE l_returnflag = 'R'),
            gt_f AS (SELECT instance_id, 'f/' || CAST(l_partkey AS VARCHAR) AS patch_file
                     FROM base WHERE l_linenumber = 1),
            top AS (SELECT * FROM preds WHERE rnk <= 20),
            matched AS (SELECT t.instance_id, count(DISTINCT t.signature) AS n_matched,
                               min(t.rnk) AS first_rank
                        FROM top t JOIN gt_e g
                          ON t.instance_id = g.instance_id AND t.signature = g.signature
                        GROUP BY t.instance_id),
            fh AS (SELECT DISTINCT t.instance_id, 1 AS find_file
                   FROM top t JOIN gt_f f ON t.instance_id = f.instance_id
                   WHERE t.file_path LIKE '%' || f.patch_file || '%'),
            gtn AS (SELECT instance_id, count(DISTINCT signature) AS n_gt FROM gt_e GROUP BY instance_id),
            per AS (SELECT gtn.instance_id, n_gt,
                           coalesce(n_matched, 0) AS n_matched,
                           coalesce(n_matched, 0)::DOUBLE / greatest(n_gt, 1) AS found_ratio,
                           CASE WHEN coalesce(n_matched, 0) > 0 THEN 1 ELSE 0 END AS morethanone,
                           coalesce(find_file, 0) AS find_file,
                           first_rank
                    FROM gtn LEFT JOIN matched ON gtn.instance_id = matched.instance_id
                             LEFT JOIN fh ON gtn.instance_id = fh.instance_id)
            SELECT CAST(count(*) AS BIGINT) AS tot,
                   CAST(sum(find_file) AS BIGINT) AS tot_find_file,
                   round(avg(find_file), 4) AS file_hit_rate,
                   round(sum(found_ratio), 4) AS tot_find_method_or_class,
                   round(avg(found_ratio), 4) AS method_or_class_rate,
                   CAST(sum(morethanone) AS BIGINT) AS morethanone,
                   round(avg(CASE WHEN first_rank IS NOT NULL THEN 1.0 / first_rank ELSE 0.0 END), 4) AS mrr
            FROM per
        """,
        "g2_bfs_hops": """
            WITH RECURSIVE bfs(node, hops) AS (
              SELECT 'region:0', 0
              UNION ALL
              SELECT e.obj, bfs.hops + 1 FROM bfs JOIN (
                SELECT 'region:' || n_regionkey AS subj, 'nation:' || n_nationkey AS obj FROM nation
                UNION ALL
                SELECT 'nation:' || c_nationkey AS subj, 'customer:' || c_custkey AS obj FROM customer
              ) e ON e.subj = bfs.node
              WHERE bfs.hops < 2
            )
            SELECT node, min(hops) AS hops FROM bfs GROUP BY node
        """,
        "ranked_related_fixture": _build_ranked_related_oracle(),
        "ranked_sweep_fixture": _build_ranked_sweep_oracle(),
        "result_documents_fixture": _build_result_docs_oracle(),
        "minhash_near_dups": _build_minhash_oracle(),
        "lsh_alias_link": _build_lsh_alias_oracle(),
        "lsh_canonical_map": _build_lsh_canon_oracle(),
        # closed-form replay of _kg_core_links: the fixture text is built
        # by construction, so the mention battery's output per page is
        # known exactly — F-slot file link, Q-slot qualified-name link,
        # C-slot call link (same target as Q, absorbed by DISTINCT),
        # C-slot shared-short-name link where min(entity_id, kind) picks
        # the class over the decoy method, and the J8 ref link with the
        # existence/self/leakage guards spelled out
        # full-pipeline replay for _kg_full_core: dict links closed-form
        # from the constructed tail, structural triples, the whole context
        # chain at build_kg's defaults (top-20 commits, top-12 repair with
        # score>=3, top-8 docs), the collidable/passthrough split, and the
        # MERGE min-weight dedup
        "kg_full_core": r"""
            WITH iss AS (
              SELECT CAST(doc_id AS VARCHAR) AS url,
                     TIMESTAMP '1996-01-01'
                       + (doc_id % 1000) * INTERVAL 1 DAY AS warc_ts,
                     ((doc_id % 20) + 1) * 10 AS mk,
                     text || ' Crash in pkg/mod'
                          || CAST(((doc_id % 20) + 1) * 10 AS VARCHAR)
                          || '.py calling pkg.mod.widget'
                          || CAST(((doc_id % 20) + 1) * 10 AS VARCHAR)
                          || ' fix broken now.' AS ft
              FROM documents
            ),
            isstok AS (
              SELECT url, warc_ts, mk,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(lower(ft), '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(ft), '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM iss
            ),
            parts0 AS (
              SELECT p_partkey AS k, p_name, p_type,
                     CASE WHEN (p_partkey // 10) % 2 = 0
                          THEN 'method' ELSE 'class' END AS kind,
                     'pkg.mod.widget' || CAST(p_partkey AS VARCHAR) AS ename,
                     'pkg/mod' || CAST(p_partkey AS VARCHAR) || '.py' AS fpath
              FROM part WHERE p_partkey % 10 = 0
            ),
            core AS (
              SELECT 'issue:' || i.url AS subj, 'points to file' AS predicate,
                     'file:' || p.fpath AS obj, CAST(0.25 AS DOUBLE) AS weight,
                     i.url AS src_url
              FROM iss i JOIN parts0 p ON p.k = i.mk
              UNION ALL
              SELECT 'issue:' || i.url,
                     CASE WHEN p.kind = 'class' THEN 'points to class'
                          ELSE 'points to method' END,
                     p.kind || ':' || p.ename || '@' || p.fpath,
                     CAST(0.5 AS DOUBLE), i.url
              FROM iss i JOIN parts0 p ON p.k = i.mk
            ),
            structural AS (
              SELECT 'directory:pkg' AS subj, 'contains file' AS predicate,
                     'file:' || fpath AS obj, CAST(0.25 AS DOUBLE) AS weight,
                     '' AS src_url
              FROM parts0
              UNION ALL
              SELECT 'file:' || fpath, 'contains class',
                     'class:' || ename || '@' || fpath, CAST(0.25 AS DOUBLE), ''
              FROM parts0 WHERE kind = 'class'
              UNION ALL
              SELECT 'class:pkg.mod@' || fpath, 'contains method',
                     'method:' || ename || '@' || fpath, CAST(0.25 AS DOUBLE), ''
              FROM parts0 WHERE kind = 'method'
            ),
            msgs AS (
              SELECT k,
                     CASE WHEN k % 3 = 0
                          THEN 'fix broken ' || p_name || ' ' || p_type
                          ELSE p_name || ' ' || p_type END AS msg
              FROM parts0
            ),
            com AS (
              SELECT lpad(CAST(k AS VARCHAR), 7, '0') AS cid,
                     TIMESTAMP '1995-06-01'
                       + (k % 1460) * INTERVAL 1 DAY AS cts,
                     regexp_matches(msg,
                       '(?i)\b(fix(?:e[sd])?|bug(?:fix)?|error|fail(?:ed|s|ure)?|regression|incorrect(?:ly)?|wrong|crash(?:es|ed)?|exception|broken|repair|resolve(?:[sd])?|invalid)\b')
                       AS is_rep,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(
                           lower(msg || chr(10) || 'pkg/data_loader.py'),
                           '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(msg), '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM msgs
              WHERE k % 11 <> 0
                AND NOT regexp_matches(split_part(msg, chr(10), 1),
                  '(?i)\b(pyupgrade|pre-commit|precommit|black|isort|ruff|flake8|pylint|format(?:ting)?|style|lint|whitespace|typo|spelling|docstring|sphinx|warning|codestyle|D\d{3,4}|B\d{3,4}|SIM\d{3,4}|RUF\d{3,4}|E\d{3,4}|W\d{3,4}|F\d{3,4}|dependabot|bump|changelog|release notes)\b')
            ),
            cpairs AS (
              SELECT i.url, c.cid, c.cts, c.is_rep,
                     len(list_intersect(i.toks, c.toks)) AS score
              FROM isstok i CROSS JOIN com c
              WHERE c.cts <= i.warc_ts
            ),
            selc AS (
              SELECT url, cid FROM (
                SELECT url, cid,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY score DESC, cts DESC, cid ASC) AS rn
                FROM cpairs WHERE score > 0
              ) WHERE rn <= 20
            ),
            selr AS (
              SELECT url, cid FROM (
                SELECT url, cid,
                       row_number() OVER (PARTITION BY url
                                          ORDER BY score DESC, cts DESC, cid ASC) AS rn
                FROM cpairs WHERE score >= 3 AND is_rep
              ) WHERE rn <= 12
            ),
            docs0 AS (
              SELECT k, 'docs/guide' || CAST(k AS VARCHAR) || '.md' AS doc_path,
                     'guide for ' || p_name || ' ' || p_type || ' `'
                       || CASE WHEN k % 7 = 0
                               THEN 'pkg.mod.nothing' || CAST(k AS VARCHAR)
                               ELSE 'pkg.mod.widget' || CAST(k AS VARCHAR) END
                       || '`' AS text,
                     (k % 7 <> 0) AS resolves, kind, ename, fpath
              FROM parts0
            ),
            dtok AS (
              SELECT k, doc_path, resolves, kind, ename, fpath,
                     list_distinct(list_concat(
                       list_filter(
                         regexp_extract_all(lower(doc_path || chr(10) || text),
                                            '[A-Za-z_][A-Za-z0-9_]{2,}'),
                         t -> t NOT IN ('and','could','error','for','from','issue',
                                        'should','that','the','this','using','when',
                                        'with','would')),
                       regexp_extract_all(lower(doc_path || chr(10) || text),
                                          '\bv?\d+(?:\.\d+){1,4}\b')
                     )) AS toks
              FROM docs0
            ),
            seld AS (
              SELECT url, k, doc_path, resolves, kind, ename, fpath FROM (
                SELECT i.url, d.k, d.doc_path, d.resolves, d.kind, d.ename, d.fpath,
                       row_number() OVER (
                         PARTITION BY i.url
                         ORDER BY len(list_intersect(i.toks, d.toks)) DESC,
                                  d.doc_path ASC
                       ) AS rn
                FROM isstok i CROSS JOIN dtok d
                WHERE len(list_intersect(i.toks, d.toks)) > 0
              ) WHERE rn <= 8
            ),
            collidable AS (
              SELECT 'issue:' || url AS subj,
                     CASE WHEN kind = 'class' THEN 'points to class'
                          ELSE 'points to method' END AS predicate,
                     kind || ':' || ename || '@' || fpath AS obj,
                     CAST(0.75 AS DOUBLE) AS weight, url AS src_url
              FROM seld WHERE resolves
            ),
            merged AS (
              SELECT subj, predicate, obj, min(weight) AS weight,
                     min(src_url) AS src_url
              FROM (SELECT * FROM core
                    UNION ALL SELECT * FROM structural
                    UNION ALL SELECT * FROM collidable)
              GROUP BY subj, predicate, obj
            ),
            passthrough AS (
              SELECT 'issue:' || url AS subj, 'points to commit' AS predicate,
                     'commit:' || cid AS obj, CAST(0.5 AS DOUBLE) AS weight,
                     url AS src_url
              FROM selc
              UNION ALL
              SELECT DISTINCT 'commit:' || cid, 'modified file',
                     'file:pkg/data_loader.py', CAST(0.5 AS DOUBLE), ''
              FROM selc
              UNION ALL
              SELECT 'issue:' || url, 'points to repair experience',
                     'repair:' || cid, CAST(0.25 AS DOUBLE), url
              FROM selr
              UNION ALL
              SELECT DISTINCT 'repair:' || cid, 'mentions file',
                     'file:pkg/data_loader.py', CAST(0.5 AS DOUBLE), ''
              FROM selr
              UNION ALL
              SELECT 'issue:' || url, 'points to documentation',
                     'doc:' || url || ':h', CAST(0.5 AS DOUBLE), url
              FROM seld WHERE resolves
              UNION ALL
              SELECT 'doc:' || url || ':h', 'mentions file by documentation',
                     'file:' || fpath, CAST(0.5 AS DOUBLE), ''
              FROM seld WHERE resolves
            )
            SELECT subj, predicate, obj, round(weight, 2) AS weight, src_url
            FROM (SELECT * FROM merged UNION ALL SELECT * FROM passthrough)
            ORDER BY subj, predicate, obj, weight, src_url
        """,
        "kg_core_links": """
            WITH sup AS (
              SELECT s_suppkey AS sk, s_nationkey AS nk FROM supplier
            ),
            links AS (
              SELECT 'page/' || sk::VARCHAR AS url,
                     'file:n' || nk::VARCHAR AS entity_id,
                     'file' AS kind, CAST(0.25 AS DOUBLE) AS weight
              FROM sup
              UNION ALL
              SELECT 'page/' || sk::VARCHAR,
                     'method:s' || sk::VARCHAR,
                     'method', CAST(0.5 AS DOUBLE)
              FROM sup
              UNION ALL
              SELECT 'page/' || sk::VARCHAR,
                     'class:c' || nk::VARCHAR,
                     'class', CAST(0.5 AS DOUBLE)
              FROM sup
              UNION ALL
              SELECT 'page/' || sk::VARCHAR,
                     'issue:page/' || ((sk * 3) % 100)::VARCHAR,
                     'issue', CAST(0.5 AS DOUBLE)
              FROM sup
              WHERE ((sk * 3) % 100) IN (SELECT sk FROM sup)
                AND ((sk * 3) % 100) <= sk
                AND ((sk * 3) % 100) <> sk
            )
            SELECT DISTINCT url, entity_id, kind, weight
            FROM links
            ORDER BY url, entity_id, kind
        """,
        # per-source cap: the two-phase skew-safe selection must equal the
        # plain window over the same unique key
        "domain_cap_docs": """
            SELECT doc_id, source, n_chars FROM documents
            QUALIFY row_number() OVER (
              PARTITION BY source ORDER BY n_chars DESC, doc_id
            ) <= 20
            ORDER BY source, doc_id
        """,
        # deterministic id-hash sample, md5_60 parameterization (md5_60 is
        # non-negative, so % equals Spark's pmod)
        "hash_sample_docs": f"""
            SELECT doc_id, lang, n_chars FROM documents
            WHERE {_h60("doc_id::VARCHAR || ':s42'")} % 1000000 < 100000
            ORDER BY doc_id
        """,
        # decontamination: same shingle construction as the minhash oracle
        # (8-gram window; < 8 tokens degenerates to the whole text), split
        # into benchmark (doc_id % 20 = 0) and train sides, joined on the
        # verbatim gram — n_hits = |distinct shared grams| per pair
        "contamination_docs": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
            ),
            sh AS (
              SELECT doc_id,
                CASE WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
                     ELSE [array_to_string(tk[i+1:i+8], ' ')
                           for i in generate_series(0, len(tk) - 8)]
                END AS shingles
              FROM toks
            ),
            grams AS (
              SELECT doc_id, unnest(list_distinct(shingles)) AS gram FROM sh
            ),
            bench AS (
              SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id % 20 = 0
            ),
            train AS (
              SELECT doc_id, gram FROM grams WHERE doc_id % 20 <> 0
            )
            SELECT t.doc_id AS doc_id, b.bench_id AS bench_id,
                   count(*) AS n_hits
            FROM train t JOIN bench b USING (gram)
            GROUP BY t.doc_id, b.bench_id
            ORDER BY doc_id, bench_id
        """,
        "simhash_docs": _build_simhash_oracle(),
        "fingerprint_docs": _build_fingerprint_oracle(),
        "lsh_cosine_topk": _build_lsh_topk_oracle(),
        "ivf_cosine_topk": _build_ivf_oracle(),
    }


if __name__ == "__main__":
    from kgcompass_spark.session import get_spark

    s = get_spark("entry-smoke")
    df = entry(s)
    df.show()
    print("queries:", len(queries()), "oracles:", len(oracle_sql()))
