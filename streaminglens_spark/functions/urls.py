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

# default per-domain document budget for domain_cap / q_domain_cap
DOMAIN_CAP_N = 8


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


def domain_cap(
    canon: DataFrame,
    n_per_domain: int = DOMAIN_CAP_N,
    key: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-domain document cap (r8): keep at most ``n_per_domain`` docs
    per domain, taken in deterministic affine-hash order over ``key`` --
    the domain-balancing pass a crawl-derived corpus runs so megadomains
    cannot dominate the training mixture (the C4/RefinedWeb
    cap-per-domain step; ``domain_stats`` measures the imbalance, this
    enforces the budget).

    Scale shape (the two-level ``token_budget_sample`` lesson applied to
    top-N): a rank window partitioned by domain alone would serialize a
    megadomain onto one reducer, so the rank runs two-level -- (1)
    row_number within (domain, hash-bucket), keep <= N per bucket
    (data-parallel; bounds survivors at N x n_buckets per domain
    regardless of corpus size), then (2) row_number within domain over
    the bounded survivors.  The kept set is identical to the one-window
    form: any row in a domain's true top-N by (hash, key) is also in its
    bucket's top-N, because removing rows never increases a remaining
    row's rank (property-pinned in ``tests/test_domain_cap.py``).
    Deterministic, content-uncorrelated, engine-exact integer hashing --
    the ``hash_sample`` hash.

    Returns the kept rows (every ``canon`` column) + ``keep_rank``
    (1-based within domain)."""
    from pyspark.sql import Window

    from .sketch import HASH_A, HASH_B, HASH_P

    h = (F.lit(HASH_A) * F.col(key) + F.lit(HASH_B)) % F.lit(HASH_P)
    rows = canon.withColumn("_h", h).withColumn(
        "_b", F.pmod(F.col("_h"), F.lit(int(n_buckets)))
    )
    w1 = Window.partitionBy("domain", "_b").orderBy(F.col("_h"), F.col(key))
    w2 = Window.partitionBy("domain").orderBy(F.col("_h"), F.col(key))
    return (
        rows.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n_per_domain)
        .withColumn("keep_rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("keep_rank") <= n_per_domain)
        .drop("_h", "_b", "_r1")
    )


def domain_cap_windowed(
    canon: DataFrame, n_per_domain: int = 8, key: str = "doc_id"
) -> DataFrame:
    """The one-window reference form of ``domain_cap`` (each domain on a
    single reducer -- correct, kept only as the bit-equality baseline for
    the property test)."""
    from pyspark.sql import Window

    from .sketch import HASH_A, HASH_B, HASH_P

    h = (F.lit(HASH_A) * F.col(key) + F.lit(HASH_B)) % F.lit(HASH_P)
    w = Window.partitionBy("domain").orderBy(F.col("_h"), F.col(key))
    return (
        canon.withColumn("_h", h)
        .withColumn("keep_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("keep_rank") <= n_per_domain)
        .drop("_h")
    )
