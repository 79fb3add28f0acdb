"""G2/G6/G8 graph operators on hand-computable graphs."""

from pyspark.sql import functions as F

from kgcompass_spark.operators.graph import (
    bounded_sssp,
    connected_components,
    pagerank,
)


def edges_df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, predicate string, obj string, weight double"
    )


def test_bounded_sssp_costs(spark):
    e = edges_df(
        spark,
        [
            ("a", "p", "b", 1.0),
            ("b", "p", "c", 1.0),
            ("a", "p", "c", 3.0),   # longer direct edge — must lose
            ("c", "p", "d", 0.5),
        ],
    )
    out = {r["node"]: (r["cost"], r["hops"]) for r in bounded_sssp(e, "a", max_hops=4).collect()}
    assert out["a"] == (0.0, 0)
    assert out["b"] == (1.0, 1)
    assert out["c"] == (2.0, 2)   # a→b→c beats a→c
    assert out["d"] == (2.5, 3)


def test_bounded_sssp_hop_limit(spark):
    e = edges_df(spark, [("a", "p", "b", 1.0), ("b", "p", "c", 1.0), ("c", "p", "d", 1.0)])
    nodes = {r["node"] for r in bounded_sssp(e, "a", max_hops=2).collect()}
    assert nodes == {"a", "b", "c"}


def test_bounded_sssp_path_structs(spark):
    e = edges_df(spark, [("a", "x", "b", 1.0), ("b", "y", "c", 1.0)])
    rows = {r["node"]: r["path"] for r in bounded_sssp(e, "a", max_hops=3).collect()}
    assert [p["predicate"] for p in rows["c"]] == ["x", "y"]
    assert [p["node"] for p in rows["c"]] == ["b", "c"]


def test_connected_components(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")],
        "src string, dst string",
    )
    out = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["x"] == out["y"] == "x"


def test_connected_components_chain(spark):
    # long chain exercises pointer jumping over several iterations
    rows = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)]
    e = spark.createDataFrame(rows, "src string, dst string")
    out = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert set(out.values()) == {"n00"}
    assert len(out) == 13


def test_connected_components_broadcast_gate_equivalence(spark):
    # forcing the size gate to 0 exercises the at-scale plain-join path;
    # output must be identical to the broadcast fast path on the same input
    rows = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(15)] + [
        ("z1", "z2"),
        ("z2", "z3"),
        ("q9", "q9"),
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    fast = {
        r["node"]: r["component"] for r in connected_components(e).collect()
    }
    plain = {
        r["node"]: r["component"]
        for r in connected_components(e, broadcast_max_edges=0).collect()
    }
    assert fast == plain
    assert set(v for k, v in fast.items() if k.startswith("n")) == {"n00"}
    assert fast["z1"] == fast["z2"] == fast["z3"] == "z1"


def test_pagerank_sink_gets_rank(spark):
    e = edges_df(
        spark,
        [("a", "p", "c", 1.0), ("b", "p", "c", 1.0), ("c", "p", "a", 1.0)],
    )
    # 40 power iterations: residual ~0.85^40 ≈ 1e-3, well under the c/a gap
    out = {r["node"]: r["score"] for r in pagerank(e, iters=40).collect()}
    assert out["c"] == 1.0          # normalized max
    assert out["a"] > out["b"]      # a receives from c; b receives nothing


def test_personalized_pagerank_root_bias(spark):
    e = edges_df(
        spark,
        [("r", "p", "a", 1.0), ("a", "p", "b", 1.0), ("b", "p", "r", 1.0)],
    )
    out = {r["node"]: r["score"] for r in pagerank(e, iters=12, personalized_root="r").collect()}
    assert out["r"] == 1.0
    assert out["a"] > out["b"]


def test_pagerank_checkpoints_edge_lineage(spark, tmp_path):
    # The edge list must be materialized ONCE before the power loop —
    # without the localCheckpoint, all 12 iterations re-evaluate the
    # upstream lineage. Pin via a side-effecting mapInPandas stage whose
    # invocation count is written to disk.
    import pandas as pd
    from pyspark.sql import functions as F

    from kgcompass_spark.operators.graph import pagerank

    marker = tmp_path / "evals"
    marker.mkdir()

    def counted(batches):
        import os
        import uuid
        (marker / f"{os.getpid()}_{uuid.uuid4().hex}").touch()
        yield from batches

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "subj string, obj string"
    ).withColumn("predicate", F.lit("p")).withColumn("weight", F.lit(1.0))
    slow = edges.coalesce(1).mapInPandas(counted, edges.schema)
    out = pagerank(slow, iters=12)
    assert out.count() == 3
    # one evaluation for the eager edge checkpoint; nodes/out_deg/loop all
    # read the checkpoint, never the python stage again
    assert len(list(marker.iterdir())) == 1


def test_connected_components_random_vs_union_find(spark):
    """Randomized cross-check of the rewritten CC: seeded random graphs
    (mixed density, self-loops, duplicate edges, singleton components via
    isolated labels) against a pure-Python union-find, through BOTH the
    broadcast fast path and the forced plain-join path."""
    import random

    rng = random.Random(1234)
    for trial, (n, m) in enumerate([(30, 15), (60, 90), (200, 150)]):
        edges = [
            (f"n{rng.randrange(n):03d}", f"n{rng.randrange(n):03d}")
            for _ in range(m)
        ]
        edges += [("n000", "n000")]  # self-loop
        edges += edges[:3]           # duplicates
        # reference union-find over the same edges
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {x: find(x) for x in parent}

        df = spark.createDataFrame(edges, "src string, dst string")
        # the plain-join (at-scale) path costs seconds per round on a
        # tiny local input — exercise it on the smallest graph only
        kwargs = {"broadcast_max_edges": 0} if trial == 0 else {}
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, **kwargs).collect()
        }
        # CC drops pure self-loop singletons from edge-derived node sets
        # only when the node appears nowhere else; union-find tracked every
        # endpoint, so compare on the CC's node set and check the label of
        # every union-find member maps consistently
        for node, comp in got.items():
            assert expected[node] == comp, (trial, node, comp, expected[node])
        assert set(got.values()) == {
            c for x, c in expected.items() if x in got
        }
