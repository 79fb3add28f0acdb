"""Profile g8 connected components: per-round wall time and job counts.

Usage: python scripts/profile_g8.py [sf_dir]
Instruments the CC loop inline (copy of operators/graph.py logic) so each
round's checkpoint job and convergence probe are timed separately.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window  # noqa: E402

from kgcompass_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile_g8", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
sc = spark.sparkContext

o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
chain = o.select(
    "o_custkey",
    F.col("o_orderkey").alias("dst"),
    F.lag("o_orderkey").over(w).alias("src"),
).filter(F.col("src").isNotNull())
pad = lambda c: F.lpad(c.cast("string"), 12, "0")  # noqa: E731
edges = chain.select(pad(F.col("src")).alias("src"), pad(F.col("dst")).alias("dst"))

# warm the scan
edges.count()

t0 = time.time()
sym = (
    edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    .filter(F.col("u") != F.col("v"))
    .unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    .distinct()
    .localCheckpoint(eager=True)
)
print(f"sym checkpoint: {time.time()-t0:.3f}s  rows={sym.count()}")

t1 = time.time()
parent = (
    sym.groupBy("u")
    .agg(F.least(F.min("v"), F.first("u")).alias("p"))
    .select(F.col("u").alias("node"), F.least(F.col("p"), F.col("node")).alias("comp"))
).localCheckpoint(eager=True)
print(f"parent checkpoint: {time.time()-t1:.3f}s")
changed = parent

for r in range(20):
    tr = time.time()
    nb = (
        sym.join(changed.select(F.col("node").alias("v"), F.col("comp").alias("vcomp")), "v")
        .groupBy("u")
        .agg(F.min("vcomp").alias("nbcomp"))
        .withColumnRenamed("u", "node")
    )
    new_parent = parent.join(nb, "node", "left").select(
        "node",
        F.least(F.col("comp"), F.coalesce(F.col("nbcomp"), F.col("comp"))).alias("comp"),
        F.col("comp").alias("_old"),
    )
    jumped = new_parent
    for _j in range(2):
        jumped = (
            jumped.alias("a")
            .join(
                jumped.select(F.col("node").alias("comp"), F.col("comp").alias("comp2")).alias("b"),
                "comp",
                "left",
            )
            .select(
                F.col("node"),
                F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"),
                "_old",
            )
        )
    t_build = time.time() - tr
    tc = time.time()
    jumped = jumped.localCheckpoint(eager=True)
    t_ckpt = time.time() - tc
    te = time.time()
    changed = jumped.filter(F.col("comp") != F.col("_old")).select("node", "comp")
    parent = jumped.select("node", "comp")
    empty = changed.isEmpty()
    t_probe = time.time() - te
    print(
        f"round {r}: build={t_build:.3f}s ckpt={t_ckpt:.3f}s probe={t_probe:.3f}s"
        f" total={time.time()-tr:.3f}s empty={empty}"
    )
    if empty:
        break

print(f"TOTAL: {time.time()-t0:.3f}s  components rows={parent.count()}")
spark.stop()
