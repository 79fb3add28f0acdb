"""Synthesize an sf1-scale surrogate dataset from the driver's sf0.1 tables.

10× replication with disjoint key spaces: every fact-table key column is
offset by rep * (max_key + 1), so foreign-key joins stay consistent within
a rep and never collide across reps. Dimensions (region, nation) copy
through. Document text gets a per-rep suffix token so exact-dedup does not
collapse the corpus to 1/10th (replicas become NEAR-duplicates — a
realistic shape for the dedup family at 10×). Output is written by Spark
with 32 files per big table, so no single-row-group scan traps.

Usage: python scripts/make_sf1.py [out_dir] [factor]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kgcompass_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# table -> list of key columns to offset by rep * stride(col's table)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key column -> which table's stride it uses (FK consistency)
STRIDE_OF = {
    "c_custkey": "customer", "s_suppkey": "supplier", "p_partkey": "part",
    "o_orderkey": "orders", "o_custkey": "customer",
    "l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier",
    "event_id": "events", "doc_id": "documents", "vec_id": "embeddings",
}
KEY_TABLE_PK = {
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "events": "event_id", "documents": "doc_id",
    "embeddings": "vec_id",
}

spark = get_spark("make_sf1", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
os.makedirs(out_dir, exist_ok=True)

strides = {}
for t, pk in KEY_TABLE_PK.items():
    mx = spark.read.parquet(f"{SRC}/{t}.parquet").agg(F.max(pk)).first()[0]
    strides[t] = int(mx) + 1
print("strides:", strides)

for t in ["region", "nation"]:
    spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
        f"{out_dir}/{t}.parquet"
    )
    print(t, "copied")

for t, keys in KEYED.items():
    base = spark.read.parquet(f"{SRC}/{t}.parquet")
    rep = base.crossJoin(spark.range(factor).select(F.col("id").alias("_rep")))
    for k in keys:
        rep = rep.withColumn(k, F.col(k) + F.col("_rep") * strides[STRIDE_OF[k]])
    if t == "documents":
        rep = rep.withColumn(
            "text", F.concat(F.col("text"), F.lit(" copyr"), F.col("_rep"))
        ).withColumn("n_chars", F.length("text").cast("long"))
    rep = rep.drop("_rep").select(*base.columns)
    nfiles = 32 if t in ("lineitem", "orders", "events") else 8
    rep.repartition(nfiles).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    print(t, rep.count() if False else "written")

print("done:", out_dir)
spark.stop()
