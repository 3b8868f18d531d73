"""URL canonicalization and domain accounting (round-5 extension).

A crawl-derived corpus keys almost everything on URLs -- dedup by
canonical URL, per-domain budgets/blocklists, recrawl scheduling -- and
raw URLs are noisy: scheme/host case, ``www.`` prefixes, default ports,
fragments, tracking parameters and trailing slashes all alias the same
resource.  The canonicalizer here is the standard normalization subset
(RFC 3986 case rules + the common tracking-param strip), built ENTIRELY
from JVM ``regexp_extract``/``regexp_replace``/`lower` column ops -- a
map-only zero-shuffle plan, no Python, no UDF -- with every pattern in
the Java-regex/RE2 shared subset (no backreference replacements), so the
DuckDB oracle can run the same parse.

Path case is PRESERVED (paths are case-sensitive; only scheme and host
lowercase), parameter ORDER is preserved (reordering changes semantics
for some endpoints; only tracking params are dropped) -- both documented
deviations from more aggressive canonicalizers.

The fixture corpus has no URL column, so ``url_corpus`` derives one
deterministically from doc_id (the ``pii_corpus`` convention), covering
the full quirk matrix: mixed-case schemes/hosts, ``www.``, default and
non-default ports, trailing slashes, fragments, tracking params in
leading/middle/trailing positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# anchored to the parameter DELIMITER (consumed by the match) so a
# parameter merely ENDING in a tracking name -- href=, subref= -- never
# loses its tail; no backreference replacement, so Java regex and RE2
# run the identical chain.  The consumed delimiter is repaired by the
# '^&' -> '?' step that follows removal.
TRACKING_PARAMS_RE = "[?&](utm_[a-z]+|ref|fbclid|gclid)=[^&]*"


def url_corpus(documents: DataFrame) -> DataFrame:
    """(doc_id, url): deterministic synthetic URLs exercising every
    canonicalization rule; pure integer/string arithmetic on doc_id."""
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    www = F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    host = F.concat(
        www, F.lit("Site"), (d % 7).cast("string"), F.lit(".ExAmple.COM")
    )
    port = F.when(
        (d % 5 == 0) & (d % 2 == 0), F.lit(":443")
    ).when(
        (d % 5 == 0) & (d % 2 == 1), F.lit(":80")
    ).when(
        d % 11 == 0, F.lit(":8080")  # NON-default port: must survive
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/Docs/p"), (d % 13).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.when(
        d % 2 == 0, F.concat(F.lit("?id="), d.cast("string"))
    ).otherwise(
        F.concat(
            F.lit("?utm_source=feed"), (d % 3).cast("string"),
            F.lit("&id="), d.cast("string"), F.lit("&utm_campaign=x"),
        )
    )
    frag = F.when(
        d % 3 == 0, F.concat(F.lit("#sec"), (d % 4).cast("string"))
    ).otherwise(F.lit(""))
    return documents.select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, port, path, query, frag).alias("url"),
    )


def canonicalize_urls(urls: DataFrame) -> DataFrame:
    """(doc_id, canon_url, domain, reg_domain): the normalization chain
    described in the module docstring.  ``domain`` is the lowercased
    host without ``www.`` or port; ``reg_domain`` its last two labels
    (the eTLD+1 approximation a public-suffix list would refine)."""
    u = F.col("url")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    host = F.regexp_extract(hostport, r"^([^:]+)", 1)
    port = F.regexp_extract(hostport, r"(:[0-9]+)$", 1)
    # default ports drop; everything else survives
    port = F.when(
        (scheme == "http") & (port == ":80"), F.lit("")
    ).when(
        (scheme == "https") & (port == ":443"), F.lit("")
    ).otherwise(port)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(rest, r"(\?.*)$", 1)
    query = F.regexp_replace(query, TRACKING_PARAMS_RE, "")
    # a removed FIRST param consumed the '?': promote the next delimiter
    query = F.regexp_replace(query, r"^&", "?")
    query = F.regexp_replace(query, r"[?&]+$", "")
    return urls.select(
        "doc_id",
        F.concat(scheme, F.lit("://"), host, port, path, query).alias("canon_url"),
        host.alias("domain"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("reg_domain"),
    )


def domain_stats(canon: DataFrame) -> DataFrame:
    """Per-domain accounting over canonicalized URLs: doc count and
    distinct canonical resources (the crawl-budget / URL-dedup input).
    One groupBy; distinct counts partial-aggregate like any other."""
    return canon.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("canon_url").cast("long").alias("n_unique_urls"),
        F.countDistinct("reg_domain").cast("long").alias("n_reg_domains"),
    )
