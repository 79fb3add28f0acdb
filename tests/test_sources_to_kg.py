"""Full self-contained loop: source files → parsed inventory → linking →
triples incl. call graph (SURVEY.md §7.1 step 3)."""

import datetime

from pyspark.sql import functions as F

from kgcompass_spark.pipeline import build_kg_from_sources

SRC_PARSER = '''"""Parser module."""

class Parser:
    def parse_block(self, value):
        return tokenize(value)

def tokenize(value):
    return value.split()
'''

SRC_UTIL = """MAX_DEPTH = 4

def helper():
    return MAX_DEPTH
"""


def _sources(spark):
    return spark.createDataFrame(
        [("mylib/engine/parser.py", SRC_PARSER), ("mylib/util.py", SRC_UTIL)],
        "file_path string, source string",
    )


def _pages(spark):
    ts = datetime.datetime(2020, 5, 1)
    body = (
        "Issue 1: crash when parsing.\n"
        "The bug is in mylib/engine/parser.py near the top.\n"
        "Calling `mylib.engine.parser.Parser.parse_block` raises ValueError.\n"
    )
    return spark.createDataFrame(
        [("https://t.example/issues/1", ts, None, body, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def test_build_kg_from_sources(spark):
    out = build_kg_from_sources(_pages(spark), _sources(spark))
    triples = {(r.subj, r.predicate, r.obj) for r in out["triples"].collect()}

    # parsed inventory produced structural triples
    assert (
        "file:mylib/engine/parser.py",
        "contains class",
        "class:mylib.engine.parser.Parser@mylib/engine/parser.py",
    ) in triples
    assert (
        "directory:mylib",
        "contains directory",
        "directory:mylib/engine",
    ) in triples

    # page mentions linked against the PARSED inventory
    assert (
        "issue:https://t.example/issues/1",
        "points to file",
        "file:mylib/engine/parser.py",
    ) in triples
    assert (
        "issue:https://t.example/issues/1",
        "points to method",
        "method:mylib.engine.parser.Parser.parse_block@mylib/engine/parser.py",
    ) in triples

    # J9: parse_block calls tokenize (same-module resolution)
    assert (
        "method:mylib.engine.parser.Parser.parse_block@mylib/engine/parser.py",
        "calls method",
        "method:mylib.engine.parser.tokenize@mylib/engine/parser.py",
    ) in triples

    # entities table exposed and well-formed
    kinds = {r["kind"] for r in out["entities"].collect()}
    assert kinds == {"class", "method", "global_var", "file", "directory"}
