"""Evaluation harness (SURVEY.md §3.3) — the reference's quality ledger
(calc_prefl.py:248-303 summary + 430-535 per-instance loop):

  per instance: top-k ranked candidates (dedup by signature, rank ≤ 20) vs
  a ground-truth entity set and a patched-file set →
    find_file      — any top-k candidate lies in a patched file
    found_ratio    — matched gt entities / |gt|
    morethanone    — ≥1 entity matched
    first_rank     — best matching rank (MRR numerator)
  totals: file-hit rate, method/class rate, rank histogram (Figure 6),
  path-length histogram (Figure 8).

All DataFrame-native: one join per gt source + per-instance aggregates —
no driver loop over instances (the reference iterates instance JSON files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def prefl_per_instance(
    preds: DataFrame,
    gt_entities: DataFrame,
    gt_files: DataFrame,
    k: int = 20,
) -> DataFrame:
    """Per-instance metrics.

    ``preds``:       (instance_id, rank, signature, file_path[, path_len])
                     rank already deduped/assigned by the ranking plan.
    ``gt_entities``: (instance_id, signature) ground-truth methods/classes.
    ``gt_files``:    (instance_id, patch_file) ground-truth patched files.
    Returns (instance_id, n_gt, n_matched, found_ratio, morethanone,
    find_file, first_rank).
    """
    top = preds.filter(F.col("rank") <= k)
    matched = top.join(gt_entities, ["instance_id", "signature"]).groupBy(
        "instance_id"
    ).agg(
        F.countDistinct("signature").alias("n_matched"),
        F.min("rank").alias("first_rank"),
    )
    file_hits = (
        top.join(gt_files, "instance_id")
        .filter(F.col("file_path").contains(F.col("patch_file")))
        .select("instance_id")
        .distinct()
        .withColumn("find_file", F.lit(1))
    )
    gt_n = gt_entities.groupBy("instance_id").agg(
        F.countDistinct("signature").alias("n_gt")
    )
    return (
        gt_n.join(matched, "instance_id", "left")
        .join(file_hits, "instance_id", "left")
        .select(
            "instance_id",
            "n_gt",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            (
                F.coalesce("n_matched", F.lit(0))
                / F.greatest(F.col("n_gt"), F.lit(1)).cast("double")
            ).alias("found_ratio"),
            (F.coalesce("n_matched", F.lit(0)) > 0).cast("int").alias("morethanone"),
            F.coalesce("find_file", F.lit(0)).alias("find_file"),
            F.col("first_rank"),
        )
    )


def prefl_summary(per_instance: DataFrame) -> DataFrame:
    """The calc_prefl printed ledger as one row: totals + rates + MRR."""
    return per_instance.agg(
        F.count("*").alias("tot"),
        F.sum("find_file").alias("tot_find_file"),
        F.round(F.avg("find_file"), 4).alias("file_hit_rate"),
        F.round(F.sum("found_ratio"), 4).alias("tot_find_method_or_class"),
        F.round(F.avg("found_ratio"), 4).alias("method_or_class_rate"),
        F.sum("morethanone").alias("morethanone"),
        F.round(
            F.avg(F.when(F.col("first_rank").isNotNull(), 1.0 / F.col("first_rank")).otherwise(0.0)),
            4,
        ).alias("mrr"),
    )


def rank_histogram(
    preds: DataFrame, gt_entities: DataFrame, k: int = 20
) -> DataFrame:
    """Figure 6: count of gt matches at each rank 1..k (rank 0 = missed
    instances, calc_prefl.py:509-510)."""
    top = preds.filter(F.col("rank") <= k)
    hits = (
        top.join(gt_entities, ["instance_id", "signature"])
        .groupBy("rank")
        .agg(F.count("*").alias("cnt"))
    )
    missed = (
        gt_entities.select("instance_id")
        .distinct()
        .join(
            top.join(gt_entities, ["instance_id", "signature"])
            .select("instance_id")
            .distinct(),
            "instance_id",
            "left_anti",
        )
        .agg(F.count("*").alias("cnt"))
        .select(F.lit(0).alias("rank"), "cnt")
    )
    return hits.unionByName(missed).filter(F.col("cnt") > 0).orderBy("rank")


def path_length_histogram(preds: DataFrame, gt_entities: DataFrame, k: int = 20) -> DataFrame:
    """Figure 8: best-path length distribution of matched candidates
    (requires a path_len column in preds)."""
    return (
        preds.filter(F.col("rank") <= k)
        .join(gt_entities, ["instance_id", "signature"])
        .groupBy("path_len")
        .agg(F.count("*").alias("cnt"))
        .orderBy("path_len")
    )


def path_type_histogram(
    preds: DataFrame, gt_entities: DataFrame, k: int = 20
) -> DataFrame:
    """Figure 7 (calc_prefl.py:62-73 count_path_start_type): node-kind
    distribution along the best paths of matched candidates. ``preds`` needs
    a ``path`` column (array<struct<predicate,node>> from bounded_sssp);
    kinds come from the '<kind>:' node-id prefix, matching the reference's
    label-derived start_type. Path items beyond the root (path[1:]) count,
    as in the reference loop (calc_prefl.py:495-497)."""
    matched = preds.filter(F.col("rank") <= k).join(
        gt_entities, ["instance_id", "signature"]
    )
    kinds = matched.select(
        F.explode(F.slice(F.col("path"), 2, 1_000_000)).alias("p")
    ).select(F.split(F.col("p.node"), ":", 2)[0].alias("node_kind"))
    return kinds.groupBy("node_kind").agg(F.count("*").alias("cnt")).orderBy("node_kind")
