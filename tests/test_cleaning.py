"""P1–P8 cleaning functions — byte-for-byte checks (SURVEY.md §5)."""

from pyspark.sql import functions as F

from kgcompass_spark.functions.cleaning import (
    clean_issue_text,
    identifier_tokens,
    module_path,
    normalize_path,
    split_identifier,
    strip_target_fix_references,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_clean_issue_text(spark):
    df = spark.createDataFrame(
        [("a<!-- hidden\nstuff -->b\n\n\n\n\nc  ",)], "t string"
    )
    out = df.select(clean_issue_text(F.col("t")).alias("v")).first()["v"]
    assert out == "a\nb\n\nc"


def test_clean_pgp_block(spark):
    txt = "x\n-----BEGIN PGP SIGNATURE-----\nAAA\n-----END PGP SIGNATURE-----\ny"
    df = spark.createDataFrame([(txt,)], "t string")
    out = df.select(clean_issue_text(F.col("t")).alias("v")).first()["v"]
    assert out == "x\n\ny"


def test_clean_null(spark):
    df = spark.createDataFrame([(None,)], "t string")
    assert df.select(clean_issue_text(F.col("t")).alias("v")).first()["v"] == ""


def test_strip_target_fix_references(spark):
    txt = (
        "See https://github.com/org/repo/pull/123 and fix in PR #123, "
        "also #123 and #1234 stay? and issue 123."
    )
    df = spark.createDataFrame([(txt, "123")], "t string, tid string")
    out = df.select(
        strip_target_fix_references(F.col("t"), F.col("tid")).alias("v")
    ).first()["v"]
    assert "github.com" not in out
    assert "[target fixing reference removed]" in out
    assert "#1234" in out  # \b guard: longer ids survive


def test_normalize_path(spark):
    cases = {
        r"a\b\c.py": "a/b/c.py",
        "./x/y.py": "x/y.py",
        "playground/repo1/pkg/mod.py": "pkg/mod.py",
        "a//b.py": "a/b.py",
    }
    for raw, want in cases.items():
        df = spark.createDataFrame([(raw,)], "t string")
        assert df.select(normalize_path(F.col("t")).alias("v")).first()["v"] == want


def test_module_path(spark):
    cases = {
        "a/b/c.py": "a.b.c",
        "a/b/__init__.py": "a.b",
    }
    for raw, want in cases.items():
        df = spark.createDataFrame([(raw,)], "t string")
        assert df.select(module_path(F.col("t")).alias("v")).first()["v"] == want


def test_identifier_tokens(spark):
    df = spark.createDataFrame([("foo_bar baz9 x yy zzz",)], "t string")
    out = df.select(identifier_tokens(F.col("t")).alias("v")).first()["v"]
    assert set(out) == {"foo_bar", "baz9", "zzz"}


def test_split_identifier(spark):
    df = spark.createDataFrame([("parseHTTPResponse_fast",)], "t string")
    out = df.select(split_identifier(F.col("t")).alias("v")).first()["v"]
    assert "parse" in out and "fast" in out
