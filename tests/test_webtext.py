"""PII redaction + URL canonicalization (functions/webtext.py)."""

from pyspark.sql import functions as F

from kgcompass_spark.functions.webtext import canonicalize_url, redact_pii


def test_redact_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex.org and ship to 10.0.0.1 or call +1 555-123-4567."),
            (2, "released on 2023-01-01 with no pii"),
            (3, None),
        ],
        "id int, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select("id", redact_pii(F.col("text")).alias("r"))
        .select("id", "r.*")
        .collect()
    }
    r1 = rows[1]
    assert r1["n_emails"] == 1 and r1["n_ips"] == 1 and r1["n_phones"] == 1
    assert "<EMAIL>" in r1["text_redacted"]
    # the IP was redacted BEFORE the phone pass, so its digits never count
    # as a phone
    assert "<IP>" in r1["text_redacted"] and "<PHONE>" in r1["text_redacted"]
    assert "@" not in r1["text_redacted"]
    # ISO dates (8 digits) stay below the phone digit floor
    r2 = rows[2]
    assert r2["text_redacted"] == "released on 2023-01-01 with no pii"
    assert r2["n_emails"] == r2["n_ips"] == r2["n_phones"] == 0
    assert rows[3]["text_redacted"] == ""


def test_canonicalize_url(spark):
    cases = [
        # scheme/host case, www, default port, tracking params, fragment
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=7&fbclid=z#frag",
         "https://ex.com/a/b?id=7"),
        ("http://Ex.org:80/", "http://ex.org/"),
        ("http://ex.org:8080/p?q=1", "http://ex.org:8080/p?q=1"),
        # non-default port for the OTHER scheme is kept
        ("http://ex.org:443/p", "http://ex.org:443/p"),
        # param order of the survivors is preserved
        ("https://a.io/x?b=2&utm_campaign=c&a=1", "https://a.io/x?b=2&a=1"),
        # bare host → root path
        ("https://a.io", "https://a.io/"),
        # empty query after stripping drops the '?'
        ("https://a.io/x?utm_source=1", "https://a.io/x"),
        # no scheme: passthrough, trimmed
        ("  plain text  ", "plain text"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "id int, u string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
