"""Interleaved A/B: fuzzy_canonical_mapping gram-attach variants.

current : grams recomputed map-side into both sides of the candidate
          attach join (two shuffles of cand).
ckpt_b  : grams localCheckpointed once; both attach sides broadcast from
          the cache (no shuffle of cand, no recompute).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kgcompass_spark.session import get_spark  # noqa: E402
from kgcompass_spark.functions.hashing import md5_60  # noqa: E402
from kgcompass_spark.operators.canonicalize import fuzzy_canonical_mapping  # noqa: E402
from kgcompass_spark.operators.dedup import (  # noqa: E402
    _ensure_parallelism,
    char_shingles,
    minhash_lsh_candidates,
    minhash_signatures,
)
from kgcompass_spark.operators.graph import connected_components  # noqa: E402

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("ab_lsh", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def names_df():
    p = spark.read.parquet(sf + "/part.parquet").filter(F.col("p_partkey") % 3 == 0)
    pid = F.lpad(F.col("p_partkey").cast("string"), 7, "0")

    def variant(tag, name_col):
        return p.select(
            F.concat(F.lit("p"), pid, F.lit(":" + tag)).alias("entity_id"),
            name_col.alias("name"),
        )

    return (
        variant("a", F.col("p_name"))
        .unionByName(variant("b", F.translate("p_name", " ", "_")))
        .unionByName(variant("c", F.regexp_replace("p_name", "e", "")))
    )


def fuzzy_ckpt_b(names, threshold=0.6, num_hashes=16, bands=4, ngram=3):
    norm = F.trim(F.regexp_replace(F.lower(F.col("name")), r"[^a-z0-9]+", " "))
    base = _ensure_parallelism(
        names.select(F.col("entity_id").alias("doc_id"), norm.alias("_nm"))
    )
    grams = base.select(
        F.array_distinct(char_shingles(F.col("_nm"), ngram)).alias("grams"), "doc_id"
    ).localCheckpoint(eager=True)
    sigs = minhash_signatures(
        base, id_col="doc_id", text_col="_nm", num_hashes=num_hashes,
        hash_fn=md5_60, shingle_col=char_shingles(F.col("_nm"), ngram),
    )
    cand = minhash_lsh_candidates(
        sigs, bands=bands, num_hashes=num_hashes, max_bucket_size=256, hash_fn=md5_60
    )
    ga = F.broadcast(grams.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("_g1")))
    gb = F.broadcast(grams.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("_g2")))
    edges = (
        cand.join(ga, "doc_a").join(gb, "doc_b")
        .withColumn("_j", F.size(F.array_intersect("_g1", "_g2")) / F.size(F.array_union("_g1", "_g2")))
        .filter(F.col("_j") >= threshold)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    cc = connected_components(edges)
    return (
        names.select(F.col("entity_id"))
        .join(cc.withColumnRenamed("node", "entity_id"), "entity_id", "left")
        .select("entity_id", F.coalesce(F.col("component"), F.col("entity_id")).alias("canonical_id"))
    )


cur = lambda: fuzzy_canonical_mapping(names_df(), hash_fn=md5_60)
new = lambda: fuzzy_ckpt_b(names_df())
n1, n2 = cur().count(), new().count()  # warm-up both
assert n1 == n2, (n1, n2)
res = {"cur": [], "ckpt_b": []}
for rep in range(3):
    for k, fn in (("cur", cur), ("ckpt_b", new)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn().count()
        res[k].append(round(time.perf_counter() - t0, 3))
print("CUR   :", res["cur"], "best", min(res["cur"]))
print("CKPT_B:", res["ckpt_b"], "best", min(res["ckpt_b"]))
spark.stop()
