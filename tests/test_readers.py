"""S1/S2/S4/S8 source connectors + P15 timestamp parsing."""

from pyspark.sql import functions as F

from kgcompass_spark.sources.readers import parse_timestamp_multi, read_pages

PAGES_COLS = ["url", "warc_ts", "html", "text", "lang"]


def test_parse_timestamp_multi(spark):
    df = spark.createDataFrame(
        [("2020-03-04T05:06:07Z",), ("2020-03-04 05:06:07",), ("2020-03-04",), ("garbage",)],
        "t string",
    )
    out = [r["v"] for r in df.select(parse_timestamp_multi(F.col("t")).alias("v")).collect()]
    assert str(out[0]) == "2020-03-04 05:06:07"
    assert str(out[1]) == "2020-03-04 05:06:07"
    assert str(out[2]) == "2020-03-04 00:00:00"
    assert out[3] is None


def test_read_jsonl_skips_bad_lines(spark, tmp_path):
    p = tmp_path / "pages.jsonl"
    p.write_text(
        '{"url": "u1", "warc_ts": "2020-01-02T03:04:05Z", "html": "<p>x</p>", "text": "x", "lang": "en"}\n'
        "this is not json at all\n"
        '{"url": "u2", "warc_ts": "2020-01-03", "text": "y", "lang": "en"}\n'
    )
    df = read_pages(spark, str(p), fmt="jsonl")
    assert df.columns == PAGES_COLS
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"u1", "u2"}
    assert bytes(rows["u1"]["html"]) == b"<p>x</p>"
    assert str(rows["u2"]["warc_ts"]).startswith("2020-01-03")


def test_read_csv(spark, tmp_path):
    p = tmp_path / "pages.csv"
    p.write_text(
        "url,warc_ts,text,lang\n"
        "u1,2020-01-02 03:04:05,hello world,en\n"
    )
    df = read_pages(spark, str(p), fmt="csv")
    assert df.columns == PAGES_COLS
    assert df.count() == 1


def test_read_binary(spark, tmp_path):
    (tmp_path / "a.html").write_bytes(b"<html><body><p>hi there</p></body></html>")
    df = read_pages(spark, str(tmp_path), fmt="binary")
    assert df.columns == PAGES_COLS
    row = df.first()
    assert b"hi there" in bytes(row["html"])


def test_git_log_to_commits(spark):
    """S9: git log --numstat text -> commits table feeding the context
    stages (no git binary at query time)."""
    from kgcompass_spark.sources.readers import commits_from_git_log

    sha_a, sha_b = "a" * 40, "b" * 40
    log = (
        f"{sha_a}|1588291200|Fix crash in parser when tokens overflow\n"
        "12\t3\talphacore/parser.py\n"
        "1\t0\tdocs/guide.md\n"
        f"\n{sha_b}|1588377600|Bump changelog for release\n"
        "2\t2\tCHANGELOG.md\n"
    )
    df = commits_from_git_log(spark, log)
    rows = {r.commit_id: r for r in df.collect()}
    assert set(rows) == {sha_a, sha_b}
    assert rows[sha_a].changed_files == ["alphacore/parser.py", "docs/guide.md"]
    assert rows[sha_a].message.startswith("Fix crash")
    assert rows[sha_b].changed_files == ["CHANGELOG.md"]
    # feeds straight into the commit-context stage
    from kgcompass_spark.operators.context import link_commit_context

    issues = spark.createDataFrame(
        [("u1", rows[sha_a].committed_ts, "crash in alphacore/parser.py when tokens overflow")],
        "url string, warc_ts timestamp, clean_text string",
    )
    triples = link_commit_context(issues, df)
    preds = {(r.subj, r.predicate, r.obj) for r in triples.collect()}
    assert ("issue:u1", "points to commit", f"commit:{sha_a}") in preds
    # the non-source path never gets a modified-file edge (fl.py:2488-2492)
    assert ("commit:" + sha_a, "modified file", "file:docs/guide.md") not in preds
    assert ("commit:" + sha_a, "modified file", "file:alphacore/parser.py") in preds
    # the maintenance 'Bump changelog' commit is filtered
    assert not any(o == f"commit:{sha_b}" for _, _, o in preds)


def test_git_log_parents_format(spark):
    """S9 parents variant: %H|%ct|%P|%s carries the parent list; merge
    commits (two parents) are excluded from the commit-context stage
    (fl.py:2438 ``len(commit.parents) != 1``)."""
    from kgcompass_spark.operators.context import eligible_commits
    from kgcompass_spark.sources.readers import commits_from_git_log

    sha_a, sha_b, sha_c = "a" * 40, "b" * 40, "c" * 40
    log = (
        f"{sha_a}|1588291200|{'0' * 40}|Fix crash in parser\n"
        "12\t3\talphacore/parser.py\n"
        f"\n{sha_b}|1588377600|{'0' * 40} {'1' * 40}|Merge branch feature | cleanup\n"
        "2\t2\talphacore/engine.py\n"
        f"\n{sha_c}|1588464000||Initial import\n"
        "9\t0\talphacore/webstack.py\n"
    )
    df = commits_from_git_log(spark, log)
    rows = {r.commit_id: r for r in df.collect()}
    assert rows[sha_a].n_parents == 1
    assert rows[sha_b].n_parents == 2
    assert rows[sha_b].message == "Merge branch feature | cleanup"
    assert rows[sha_c].n_parents == 0  # root commit
    kept = {r.commit_id for r in eligible_commits(df).collect()}
    assert kept == {sha_a}
