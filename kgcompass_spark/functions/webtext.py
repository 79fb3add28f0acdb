"""Web-text curation scalars — PII redaction and URL canonicalization.

Two operations every Common-Crawl-scale training pipeline runs before
anything else touches the text: strip personally-identifying strings, and
collapse URL spelling variants so url-keyed dedup/joins see one key per
page. Both are pure Catalyst regexp chains (JVM-side, codegen'd, zero
shuffles) and both keep to the RE2-compatible regex subset (no
lookaround, no backrefs) so a DuckDB oracle replays them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe patterns (shared verbatim by the oracle SQL)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
# 9-13 digits with optional +CC prefix and space/dash/dot separators;
# the digit-count floor keeps ISO dates (8 digits) out
PHONE_RE = r"\b(?:\+\d{1,3}[ -]?)?(?:\d[ .-]?){8,12}\d\b"


def redact_pii(text: Column) -> Column:
    """Struct(text_redacted, n_emails, n_ips, n_phones): emails → <EMAIL>,
    IPv4 literals → <IP>, phone-like digit runs → <PHONE>, applied IN THAT
    ORDER (an IP would otherwise count as a phone; counts are taken on the
    progressively-redacted text so nothing double-counts). Counts ride
    along so corpus-level PII density is one aggregation away — the audit
    number privacy reviews ask for.
    """
    t = F.coalesce(text, F.lit(""))
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
    t1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), 0))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return F.struct(
        t3.alias("text_redacted"),
        n_emails.alias("n_emails"),
        n_ips.alias("n_ips"),
        n_phones.alias("n_phones"),
    )


# tracking parameters stripped by canonicalize_url (the usual dedup list)
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|ref)(=|$)"


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical URL string for url-keyed dedup/joins: lowercase scheme and
    host, drop a leading ``www.``, drop default ports (:80 http / :443
    https), drop the fragment, strip tracking query parameters (utm_*,
    gclid, fbclid, msclkid, mc_eid, ref) while PRESERVING the order of the
    rest, drop an empty ``?``, and collapse a bare trailing slash on the
    path root. Non-URL input (no scheme) passes through trimmed —
    canonicalization must never invent structure.
    """
    u = F.trim(F.coalesce(url, F.lit("")))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    if strip_www:
        hostport = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_replace(F.regexp_extract(pathq, r"\?(.*)$", 1), r"^", "")
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_PARAM_RE),
    )
    qstr = F.array_join(kept, "&")
    path_norm = F.when(path.isin("", "/"), F.lit("/")).otherwise(
        F.regexp_replace(path, r"/$", "")
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path_norm,
        F.when(F.length(qstr) > 0, F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)
