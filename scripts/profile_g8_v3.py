"""Variant C: stale-jump fused CC — pointer jumps look up the PREVIOUS
round's materialized parent (safe: min-label propagation's fixpoint is
already correct; jumping only accelerates), so every broadcast build is a
cache scan, and the whole round is one materialization + one count job.

Usage: python scripts/profile_g8_v3.py [sf_dir] [n_jumps] [use_broadcast]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window  # noqa: E402

from kgcompass_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_jumps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
use_bcast = (sys.argv[3] if len(sys.argv) > 3 else "1") == "1"
B = F.broadcast if use_bcast else (lambda df: df)
spark = get_spark("profile_g8_v3", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
chain = o.select(
    "o_custkey",
    F.col("o_orderkey").alias("dst"),
    F.lag("o_orderkey").over(w).alias("src"),
).filter(F.col("src").isNotNull())
pad = lambda c: F.lpad(c.cast("string"), 12, "0")  # noqa: E731
edges = chain.select(pad(F.col("src")).alias("src"), pad(F.col("dst")).alias("dst"))
edges.count()  # warm scan

t0 = time.time()
sym = (
    edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    .filter(F.col("u") != F.col("v"))
    .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    .distinct()
    .localCheckpoint(eager=True)
)
print(f"sym checkpoint: {time.time()-t0:.3f}s")

t1 = time.time()
parent = (
    sym.groupBy("u")
    .agg(F.least(F.min("v"), F.first("u")).alias("p"))
    .select(F.col("u").alias("node"), F.least(F.col("p"), F.col("node")).alias("comp"))
).localCheckpoint(eager=True)
print(f"parent ckpt: {time.time()-t1:.3f}s")
changed = parent

for r in range(30):
    tr = time.time()
    nb = (
        sym.join(B(changed.select(F.col("node").alias("v"), F.col("comp").alias("vcomp"))), "v")
        .groupBy("u")
        .agg(F.min("vcomp").alias("nbcomp"))
        .withColumnRenamed("u", "node")
    )
    stepped = parent.join(B(nb), "node", "left").select(
        "node",
        F.least(F.col("comp"), F.coalesce(F.col("nbcomp"), F.col("comp"))).alias("comp"),
        F.col("comp").alias("_old"),
    )
    # stale jumps: lookup table is the PREVIOUS parent (materialized)
    lut = parent.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
    jumped = stepped
    for _j in range(n_jumps):
        jumped = (
            jumped.join(B(lut), "comp", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"),
                "_old",
            )
        )
    jumped = jumped.localCheckpoint(eager=True)
    changed = jumped.filter(F.col("comp") != F.col("_old")).select("node", "comp")
    parent = jumped.select("node", "comp")
    empty = changed.isEmpty()
    print(f"round {r}: total={time.time()-tr:.3f}s empty={empty}")
    if empty:
        break

print(f"TOTAL: {time.time()-t0:.3f}s  rows={parent.count()}")
spark.stop()
