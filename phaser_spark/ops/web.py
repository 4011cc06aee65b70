"""URL / domain operators for web-corpus curation.

Engine addition (the reference, lisad/phaser, has no web operators);
part of the LLM-data suite.  Web-scale corpora (C4, RefinedWeb) filter
by URL domain before anything else — these helpers keep that step a
pure Catalyst projection.

The URL regex deliberately uses the Java-regex ∩ RE2 common subset and
contains no single quotes, so the DuckDB oracle can embed the identical
pattern string.
"""

from __future__ import annotations

from pyspark.sql import Column as SparkCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scheme://host[...] — the character class stops at whitespace and quote
# characters without using lookarounds (RE2-compatible).  (?i) because
# schemes are case-insensitive in the wild (HTTP://...); the final
# character class excludes sentence punctuation so prose like
# "see https://x.com, it rocks" doesn't capture the trailing comma into
# the URL (and then into the domain key).
URL_PATTERN = r"(?i)https?://[A-Za-z0-9._~:/?#@!$&()*+,;=%-]*[A-Za-z0-9_~/=%#-]"
# optional userinfo (user or user:pass, '@'-terminated) is skipped so the
# captured host is the real one, never 'user@host' or just 'user'
DOMAIN_PATTERN = r"(?i)https?://(?:[^/?#@]*@)?([^/:?#@]+)"


def extract_urls(col: SparkCol) -> SparkCol:
    """All URLs in the text (array<string>, document order)."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), F.lit(0))


def url_count(col: SparkCol) -> SparkCol:
    return F.size(extract_urls(col))


def domain_of(url: SparkCol) -> SparkCol:
    """Lower-cased host part of a URL ('' when the pattern mismatches)."""
    return F.lower(F.regexp_extract(url, DOMAIN_PATTERN, 1))


def domains_in(col: SparkCol) -> SparkCol:
    """Distinct lower-cased domains mentioned in the text."""
    return F.array_distinct(F.transform(extract_urls(col), domain_of))


def filter_blocked_domains(
    df: DataFrame, text_col: str = "text", blocked: list[str] | None = None
) -> DataFrame:
    """Drop documents that link to any blocked domain — a pure
    projection+filter, zero shuffle at any corpus size."""
    if not blocked:
        return df
    hit = F.exists(
        domains_in(F.col(text_col)), lambda d: d.isin(*[b.lower() for b in blocked])
    )
    # coalesce: a NULL text column yields NULL (not false) from exists,
    # and filter would silently drop the document as if it were blocked
    return df.filter(~F.coalesce(hit, F.lit(False)))


def domain_doc_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(domain, n_docs): how many documents mention each domain — the
    corpus-level signal used for domain allow/deny curation.  One explode
    + one map-side-combinable count keyed on the domain."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(domains_in(F.col(text_col))).alias("domain"),
        )
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


#: query parameters stripped by canonicalize_url: pure tracking state
#: (regex alternation, RE2-safe, no single quotes — embeddable in SQL)
TRACKING_PARAM_PATTERN = (
    r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|igshid|spm)="
)


def canonicalize_url(url: SparkCol) -> SparkCol:
    """Canonical form of a URL for dedup keying / domain joins:
    lower-cased scheme and host, default ports stripped (``:80`` for
    http, ``:443`` for https), fragment removed, tracking query
    parameters (``utm_*``, ``gclid``, ``fbclid``, …) dropped, and the
    surviving parameters SORTED so parameter order never splits one
    logical URL into two keys.

    Pure Catalyst expression (regex extract/replace + array filter/sort
    — zero shuffle, zero Python), built from the RE2∩Java regex subset
    so an external SQL oracle replays it verbatim.  Inputs that do not
    look like a URL pass through unchanged."""
    scheme = F.lower(F.regexp_extract(url, r"(?i)^(https?)://", 1))
    # userinfo (user[:pass]@) skipped, not captured: with the old
    # [^/:?#]+ host class, 'https://u:p@a.com/x' captured host='u' and
    # stripped the whole authority — two different hosts' URLs could
    # collapse to one corrupted dedup key
    host = F.lower(
        F.regexp_extract(url, r"(?i)^https?://(?:[^/?#@]*@)?([^/:?#@]+)", 1)
    )
    port = F.regexp_extract(
        url, r"(?i)^https?://(?:[^/?#@]*@)?[^/:?#@]+(:[0-9]+)", 1
    )
    port = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443")),
        F.lit(""),
    ).otherwise(port)
    # everything after host[:port], fragment stripped
    rest = F.regexp_replace(
        F.regexp_replace(url, r"(?i)^https?://[^/?#]*", ""), r"#.*$", ""
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_replace(rest, r"^[^?]*\??", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    q = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        port,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", rebuilt).otherwise(url)
