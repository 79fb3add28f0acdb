"""Interleaved A/B: round-5 CC implementation vs round-6 fused CC.

Runs the full g8 entry (scan + chain window + CC + singleton join + count)
alternating old/new in ONE JVM, 3 reps each, clearCache between reps —
same measurement conditions as bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F, Window  # noqa: E402

from kgcompass_spark.session import get_spark  # noqa: E402
from kgcompass_spark.operators.graph import connected_components  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("ab_g8", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def cc_old(edges, src="src", dst="dst", max_iter=20):
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    parent = (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("p"))
        .select(F.col("u").alias("node"), F.least(F.col("p"), F.col("node")).alias("comp"))
    ).localCheckpoint(eager=True)
    changed = parent
    for _ in range(max_iter):
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
        jumped = jumped.localCheckpoint(eager=True)
        changed = jumped.filter(F.col("comp") != F.col("_old")).select("node", "comp")
        parent = jumped.select("node", "comp")
        if changed.isEmpty():
            break
    return parent.select(F.col("node"), F.col("comp").alias("component"))


def g8_entry(cc_fn):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chain = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("dst"),
        F.lag("o_orderkey").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    pad = lambda c: F.lpad(c.cast("string"), 12, "0")  # noqa: E731
    edges = chain.select(pad(F.col("src")).alias("src"), pad(F.col("dst")).alias("dst"))
    cc = cc_fn(edges)
    all_nodes = o.select(pad(F.col("o_orderkey")).alias("node"))
    full = all_nodes.join(cc, "node", "left").select(
        "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
    )
    return full


def cc_new(edges):
    # entry parity: chain edges are distinct by construction
    return connected_components(edges, dedup_edges=False)


# warm-up both
g8_entry(cc_old).count()
g8_entry(cc_new).count()

res = {"old": [], "new": []}
for rep in range(3):
    for name, fn in (("old", cc_old), ("new", cc_new)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        g8_entry(fn).count()
        res[name].append(round(time.perf_counter() - t0, 3))
        print(f"rep{rep} {name}: {res[name][-1]}s")
print("OLD:", res["old"], "best", min(res["old"]))
print("NEW:", res["new"], "best", min(res["new"]))
spark.stop()
