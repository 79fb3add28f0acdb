"""Variant B: broadcast-join small-graph CC with persist+count convergence.

One count job per round; explicit F.broadcast avoids shuffle writes for the
join build sides. Compare wall vs profile_g8.py (variant A, current impl).
Usage: python scripts/profile_g8_v2.py [sf_dir] [n_jumps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window  # noqa: E402

from kgcompass_spark.session import get_spark  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
n_jumps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_spark("profile_g8_v2", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))

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
).persist()
parent.count()
print(f"parent persist: {time.time()-t1:.3f}s")
changed = parent
to_unpersist = [parent]

for r in range(20):
    tr = time.time()
    nb = (
        sym.join(
            F.broadcast(changed.select(F.col("node").alias("v"), F.col("comp").alias("vcomp"))),
            "v",
        )
        .groupBy("u")
        .agg(F.min("vcomp").alias("nbcomp"))
        .withColumnRenamed("u", "node")
    )
    new_parent = parent.join(F.broadcast(nb), "node", "left").select(
        "node",
        F.least(F.col("comp"), F.coalesce(F.col("nbcomp"), F.col("comp"))).alias("comp"),
        F.col("comp").alias("_old"),
    )
    jumped = new_parent
    for _j in range(n_jumps):
        jumped = (
            jumped.alias("a")
            .join(
                F.broadcast(
                    jumped.select(F.col("node").alias("comp"), F.col("comp").alias("comp2"))
                ).alias("b"),
                "comp",
                "left",
            )
            .select(
                F.col("node"),
                F.least(F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))).alias("comp"),
                "_old",
            )
        )
    jumped = jumped.persist()
    to_unpersist.append(jumped)
    n_changed = jumped.filter(F.col("comp") != F.col("_old")).count()
    changed = jumped.filter(F.col("comp") != F.col("_old")).select("node", "comp")
    parent = jumped.select("node", "comp")
    print(f"round {r}: total={time.time()-tr:.3f}s changed={n_changed}")
    if n_changed == 0:
        break

print(f"TOTAL: {time.time()-t0:.3f}s  rows={parent.count()}")
for df in to_unpersist:
    df.unpersist()
spark.stop()
