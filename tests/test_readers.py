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
