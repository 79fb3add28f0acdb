"""Parameterized CC profiler — replaces the four round-6 stats-tower
forensics one-offs (profile_g8*.py) and the old/new A/B (ab_g8.py), whose
conclusions are recorded in BENCH/BASELINE.md and the round-6 notes.

Modes:
  rounds   per-round wall time of the g8 CC on a given sf_dir (the shape
           that exposed the stats-tower: watch for super-linear growth)
  deep     force N rounds on a long-chain graph (spill_every A/B: the
           power-tower regression reproducer)
  gate     interleaved A/B of the broadcast gate (plain joins vs forced
           broadcast) on the g8 graph — 3 reps each, one JVM

Usage: python scripts/profile_cc.py <mode> [sf_dir] [--rounds N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kgcompass_spark.operators.graph import connected_components  # noqa: E402
from kgcompass_spark.session import get_spark  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "rounds"
SF = next((a for a in sys.argv[2:] if not a.startswith("--")),
          "/root/testdata/sf0.1")
N_ROUNDS = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 12

spark = get_spark("profile_cc", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))


def g8_edges():
    o = spark.read.parquet(SF + "/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chain = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("dst"),
        F.lag("o_orderkey").over(w).alias("src"),
    ).filter(F.col("src").isNotNull())
    return chain.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )


def chain_edges(n):
    return spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


if MODE == "rounds":
    # per-round timing: run CC with max_iter=k for growing k; the delta
    # between consecutive k is that round's cost (includes fixed overhead)
    prev = 0.0
    for k in range(1, 7):
        t0 = time.perf_counter()
        connected_components(g8_edges(), dedup_edges=False, max_iter=k).count()
        dt = time.perf_counter() - t0
        print(f"max_iter={k}: total {dt:.2f}s (+{dt - prev:.2f}s)", flush=True)
        prev = dt
elif MODE == "deep":
    # genuinely deep graph: a 1M-node chain needs ~9-12 REAL rounds (the
    # convergence probe cannot short-circuit them), which is past the
    # round-6 stats-tower onset (~round 8). A/B the stats-reset spill.
    n = N_ROUNDS * 0 + 1_000_000
    for spill in (4, 0):
        t0 = time.perf_counter()
        connected_components(
            chain_edges(n), dedup_edges=False, max_iter=40,
            spill_every=spill,
        ).count()
        print(f"spill_every={spill}: {time.perf_counter() - t0:.2f}s "
              f"({n}-node chain)", flush=True)
elif MODE == "gate":
    def run(gate):
        connected_components(
            g8_edges(), dedup_edges=False, broadcast_max_edges=gate
        ).count()
    run(10**9)  # warm
    for rep in range(3):
        for gate, tag in ((0, "plain"), (10**9, "broadcast")):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run(gate)
            print(f"{tag} rep{rep}: {time.perf_counter() - t0:.2f}s", flush=True)
else:
    raise SystemExit(f"unknown mode {MODE!r}")
