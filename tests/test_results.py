"""Per-instance result-document export (plans/results.py) — schema pinned
to the reference JSON shape (fl.py:465-468, 2719-2733;
knowledge_graph.py:1179-1262)."""

import json

import pytest
from pyspark.sql import functions as F

from kgcompass_spark.plans.results import result_documents, write_result_documents

ENT_FIELDS = [
    "type", "name", "signature", "file_path", "documentation", "source_code",
    "start_line", "end_line", "issue_id", "title", "content",
    "similarity", "distance", "graph_node_id",
]


@pytest.fixture(scope="module")
def docs(spark):
    ranked = spark.createDataFrame(
        [
            ("issue:r1", "method:a.f@a.py", "method", 0.9, 0.25, 1, 1),
            ("issue:r1", "method:b.g@b.py", "method", 0.7, 0.50, 2, 2),
            # duplicate (name, signature, file_path) key at worse rank —
            # keep-one must drop it
            ("issue:r1", "method:a.f2@a.py", "method", 0.5, 0.75, 3, 3),
            ("issue:r1", "class:a.C@a.py", "class", 0.6, 0.25, 1, 1),
            ("issue:r1", "issue:other", "issue", 0.4, 0.25, 1, 1),
            ("issue:r2", "method:b.g@b.py", "method", 0.8, 0.25, 1, 1),
        ],
        "root string, node string, entity_type string, similarity double,"
        " distance double, hops int, type_rank int",
    )
    entities = spark.createDataFrame(
        [
            ("method:a.f@a.py", "f", "def f()", "a.py", 1, 5, "doc f"),
            # same dedup key as method:a.f@a.py
            ("method:a.f2@a.py", "f", "def f()", "a.py", 9, 12, "doc f2"),
            ("method:b.g@b.py", "g", "def g()", "b.py", 2, 6, "doc g"),
            ("class:a.C@a.py", "C", "class C", "a.py", 1, 20, "doc C"),
        ],
        "entity_id string, name string, signature string, file_path string,"
        " start_line int, end_line int, doc_string string",
    )
    issue_meta = spark.createDataFrame(
        [
            ("r1", "Root one title", "root one body"),
            ("r2", "Root two title", "root two body"),
            ("other", "Other issue", "other body"),
        ],
        "url string, title string, content string",
    )
    stats = spark.createDataFrame(
        [("issue:r1", 3, 17)],
        "root string, skipped_due_to_time int, valid_related_items int",
    )
    return result_documents(
        ranked, entities, issue_meta, artifact_stats=stats,
        repo_name="org/repo", benchmark_name="bench",
        saved_at="2026-01-01T00:00:00+00:00",
    )


def test_schema_matches_reference_shape(docs):
    assert docs.columns == [
        "instance_id", "related_entities", "artifact_stats", "kg_params",
        "run_meta",
    ]
    re_type = docs.schema["related_entities"].dataType
    assert [f.name for f in re_type.fields] == ["methods", "classes", "issues"]
    ent_type = re_type["methods"].dataType.elementType
    assert [f.name for f in ent_type.fields] == ENT_FIELDS
    stats_type = docs.schema["artifact_stats"].dataType
    assert [f.name for f in stats_type.fields] == [
        "skipped_due_to_time", "valid_related_items",
    ]
    assert [f.name for f in docs.schema["kg_params"].dataType.fields] == [
        "decay_factor", "vector_similarity_weight",
    ]
    assert [f.name for f in docs.schema["run_meta"].dataType.fields] == [
        "instance_id", "repo_name", "benchmark_name", "saved_at",
    ]


def test_document_contents(docs):
    by_id = {r["instance_id"]: r for r in docs.collect()}
    assert set(by_id) == {"r1", "r2"}
    r1 = by_id["r1"]
    methods = r1["related_entities"]["methods"]
    # keep-one dedup: the (f, def f(), a.py) key appears once, best rank kept
    assert [m["graph_node_id"] for m in methods] == [
        "method:a.f@a.py", "method:b.g@b.py",
    ]
    assert methods[0]["similarity"] == 0.9
    assert methods[0]["signature"] == "def f()"
    assert methods[0]["start_line"] == 1 and methods[0]["end_line"] == 5
    assert methods[0]["source_code"] is None
    assert methods[0]["issue_id"] is None
    classes = r1["related_entities"]["classes"]
    assert classes[0]["name"] == "C" and classes[0]["signature"] is None
    # root issue at the head: similarity 2.0, distance 0
    issues = r1["related_entities"]["issues"]
    assert issues[0]["issue_id"] == "r1"
    assert issues[0]["similarity"] == 2.0 and issues[0]["distance"] == 0.0
    assert issues[1]["issue_id"] == "other"
    assert issues[1]["title"] == "Other issue"
    assert issues[1]["content"] == "other body"
    assert issues[1]["file_path"] is None
    assert r1["artifact_stats"]["skipped_due_to_time"] == 3
    assert r1["artifact_stats"]["valid_related_items"] == 17
    assert r1["kg_params"]["decay_factor"] == 0.6
    assert r1["kg_params"]["vector_similarity_weight"] == 0.3
    assert r1["run_meta"]["instance_id"] == "r1"
    assert r1["run_meta"]["repo_name"] == "org/repo"
    # r2 had no artifact_stats row -> zeros; no issues beyond the root
    r2 = by_id["r2"]
    assert r2["artifact_stats"]["skipped_due_to_time"] == 0
    assert [i["issue_id"] for i in r2["related_entities"]["issues"]] == ["r2"]


def test_json_roundtrip(docs, tmp_path):
    out = str(tmp_path / "results")
    write_result_documents(docs, out)
    lines = []
    for p in (tmp_path / "results").glob("*.json"):
        lines += [json.loads(ln) for ln in p.read_text().splitlines()]
    assert len(lines) == 2
    doc = next(d for d in lines if d["instance_id"] == "r1")
    assert set(doc) == {
        "instance_id", "related_entities", "artifact_stats", "kg_params",
        "run_meta",
    }
    assert doc["related_entities"]["methods"][0]["name"] == "f"
    assert doc["run_meta"]["saved_at"] == "2026-01-01T00:00:00+00:00"
    # explicit nulls survive (reference json.dump shape): every entity dict
    # carries all 14 keys regardless of type
    m0 = doc["related_entities"]["methods"][0]
    assert set(m0) == set(ENT_FIELDS)
    assert m0["source_code"] is None and m0["issue_id"] is None
