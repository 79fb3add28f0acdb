"""kgcompass_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first reimplementation of the KG-construction stage of
GLEAM-Lab/KGCompass (reference at /root/reference, studied for semantics only):
batch pipeline over Common-Crawl-style web pages →

    pages → clean_text → mentions → entity linking (broadcast alias dict +
    LSH-blocked scoring join) → (subj, pred, obj) triples → connected-components
    canonicalization → bounded-hop BFS ranking → materialized entity/edge tables

Everything is declarative DataFrame/SQL so Catalyst handles pushdown, pruning
and join strategy; Python appears only in vectorized Arrow/pandas UDFs
(HTML→text, AST-ish snippet parsing, LCS).
"""

__version__ = "0.1.0"
