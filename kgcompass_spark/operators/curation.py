"""Corpus-curation operators — per-domain caps and deterministic sampling.

Training-data pipelines apply these between dedup and tokenization:
  domain_cap   — no single domain/source may contribute more than k
                 documents (Common-Crawl-style anti-spam curation)
  hash_sample  — deterministic, seedable subsampling by id hash (data
                 mixing / ablation slices that stay stable across runs)

Scale notes: the naive per-domain cap is a row_number window partitioned
by domain — which ships EVERY document of a mega-domain into one task
(the canonical 100-TB skew failure: one spam domain with 10^9 pages).
``domain_cap`` therefore runs an exact two-phase selection: a per-
(input-partition, domain) partial top-k over a SKINNY (key, id)
projection bounds the exchange at |partitions| × |domains| × k rows and
never moves the document text; the final window sees only those
candidates, and the kept-id set joins back to full rows. hash_sample is
a pure narrow filter — no shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def domain_cap(
    docs: DataFrame,
    k: int,
    order_key,
    domain_col: str = "source",
    id_col: str = "doc_id",
    broadcast_keepers: bool = True,
) -> DataFrame:
    """Keep at most ``k`` documents per ``domain_col``, chosen by the
    ASCENDING composite ``order_key`` Column (encode descending priorities
    by negating numeric fields, e.g. ``F.struct((-F.col("n_chars"))
    .alias("q"), F.col("doc_id").alias("id"))``). The key must be unique
    per row (end it with the id) so the selection is deterministic.

    Exact: every global per-domain top-k row is a per-partition top-k row
    of its own partition, so the partial slice loses nothing. The final
    window runs over at most |partitions|×k rows per domain. The kept-id
    set is skinny (ids only); with ``broadcast_keepers`` it joins back as
    a broadcast left-semi (right for caps that fit the broadcast limit —
    |domains|×k rows); set it False to let the planner shuffle-join when
    the cap table itself is huge.
    """
    skinny = docs.select(
        F.col(id_col).alias("_id"),
        F.col(domain_col).alias("_dom"),
        order_key.alias("_k"),
    )
    partial = (
        skinny.groupBy(F.spark_partition_id().alias("_pid"), "_dom")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("_k", "_id"))), 1, k
            ).alias("_top")
        )
        .select("_dom", F.explode("_top").alias("_t"))
        .select("_dom", F.col("_t._k").alias("_k"), F.col("_t._id").alias("_id"))
    )
    w = Window.partitionBy("_dom").orderBy("_k")
    keepers = (
        partial.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col("_id").alias(id_col))
    )
    if broadcast_keepers:
        keepers = F.broadcast(keepers)
    return docs.join(keepers, id_col, "left_semi")


def hash_sample(
    docs: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
    hash_fn=None,
) -> DataFrame:
    """Deterministic subsample: keep a row iff
    ``hash(id || ':' || salt) mod 1e6 < fraction * 1e6``. Stable across
    runs, cluster layouts and partitionings (unlike ``df.sample``, whose
    draw depends on partition iteration order), so ablation slices and
    mixing weights are reproducible. Pure narrow filter — no shuffle.

    ``hash_fn`` defaults to ``F.xxhash64`` reduced to a non-negative
    bucket; pass ``functions.hashing.md5_60`` for the DuckDB-reproducible
    oracle parameterization (md5_60 is already non-negative).
    """
    if hash_fn is None:
        hash_fn = F.xxhash64
    bucket = F.pmod(
        hash_fn(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
        F.lit(1_000_000),
    )
    # round, not truncate: float error (0.29 * 1e6 = 289999.999…) would
    # silently drop one bucket versus the documented fraction*1e6 contract
    return docs.filter(bucket < round(fraction * 1_000_000))
