"""J9: call-graph extraction + resolution → `calls method` triples."""

from pyspark.sql import functions as F

from kgcompass_spark.functions.code_entities import (
    call_graph_edges,
    extract_call_sites,
    extract_entities,
    method_call_sites,
)

SRC_A = """import pkg.util as u

class Engine:
    def start(self):
        u.spin_up()
        self.stop()

    def stop(self):
        pass

def main():
    Engine()
    helper_fn(1)

def helper_fn(x):
    return x
"""

SRC_B = """def spin_up():
    return 1
"""


def test_method_call_sites_candidates():
    rows = method_call_sites("app/engine.py", SRC_A)
    by_caller = {}
    for r in rows:
        by_caller.setdefault(r["caller_name"], set()).add(r["callee_candidate"])
    # import-alias resolution: u.spin_up → pkg.util.spin_up
    assert "pkg.util.spin_up" in by_caller["app.engine.Engine.start"]
    # self.stop → same-class candidate
    assert "app.engine.Engine.stop" in by_caller["app.engine.Engine.start"]
    # bare call in module function → same-module candidate
    assert "app.engine.helper_fn" in by_caller["app.engine.main"]


def test_call_graph_edges_spark(spark):
    files = spark.createDataFrame(
        [("app/engine.py", SRC_A), ("pkg/util.py", SRC_B)],
        "file_path string, source string",
    )
    entities = extract_entities(files).withColumn(
        "entity_id",
        F.concat(F.lit("method:"), F.col("name"), F.lit("@"), F.col("file_path")),
    )
    sites = extract_call_sites(files)
    edges = call_graph_edges(sites, entities)
    got = {(r["subj"], r["obj"]) for r in edges.collect()}
    assert (
        "method:app.engine.Engine.start@app/engine.py",
        "method:pkg.util.spin_up@pkg/util.py",
    ) in got
    assert (
        "method:app.engine.Engine.start@app/engine.py",
        "method:app.engine.Engine.stop@app/engine.py",
    ) in got
    assert (
        "method:app.engine.main@app/engine.py",
        "method:app.engine.helper_fn@app/engine.py",
    ) in got
    assert all(s != o for s, o in got)
    preds = {r["predicate"] for r in edges.collect()}
    assert preds == {"calls method"}
