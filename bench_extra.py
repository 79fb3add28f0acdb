#!/usr/bin/env python3
"""Per-query isolation harness (guide §1.4/§1.5) — NOT the official bench.

Times individual declared queries with the noop sink (so the computation is
measured, not the sink), labels jobs, and captures .explain("formatted") to
plans/<tag>/<query>_<suffix>.txt. bench.py stays the frozen official
methodology; numbers from here are cited as isolation evidence only.

Usage:
  python bench_extra.py --queries g8_connected_components,lsh_canonical_map \
      [--sf-dir /root/testdata/sf1.0] [--reps 3] [--plans plans/r07] \
      [--suffix before] [--no-explain]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated query names, or 'all'")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain files (skip if unset)")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-explain", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from kgcompass_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_PIN_HEAP", "1")
    spark = get_spark("bench_extra", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 8))
    sc = spark.sparkContext

    qs = entrymod.queries()
    names = list(qs) if args.queries == "all" else args.queries.split(",")
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"{name}: warmup")
        df = fn(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        if args.plans and not args.no_explain:
            os.makedirs(args.plans, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        reps = []
        for r in range(args.reps):
            spark.catalog.clearCache()
            sc.setJobDescription(f"{name}: rep{r}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        out[name] = {"best": min(reps), "reps": reps}
        print(f"## {name}: best={min(reps)} reps={reps}", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "cpus": args.cpus,
                      "results": out}))


if __name__ == "__main__":
    main()
