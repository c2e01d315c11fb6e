"""Web-crawl curation: URL normalization and URL-level dedup.

Crawl corpora arrive with the same page under many spellings — mixed-case
hosts, tracking params, fragments, default ports, root slashes.  URL
canonicalization is the first dedup stage of every crawl pipeline
(cheaper than any content hash: it needs only the key column), and the
canonical form is also the join key for domain-level mixing/blocklists.

Everything is per-row JVM regex/string expressions — whole-stage
codegen, no shuffle in :func:`normalize_url` itself; :func:`url_dedup`
adds the one hash aggregation any exact dedup needs.  The rules are
plain regexes (no ``parse_url``) so any engine — including the DuckDB
oracle — can replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_url_col",
    "normalize_url",
    "url_dedup",
    "host_col",
    "domain_filter",
    "frontier_schedule",
]

# Authority prefix: scheme://host[:port] — everything before the first
# '/', '?' or '#' past the scheme separator.
_AUTH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def normalize_url_col(url: Column) -> Column:
    """Canonical form of a URL column.

    Rules (the conservative, loss-free subset every canonicalizer
    agrees on):

    1. trim surrounding whitespace;
    2. lowercase the scheme and authority (host names are
       case-insensitive; paths are NOT touched);
    3. drop the fragment (``#…`` never reaches the server);
    4. drop explicit default ports (``http://h:80``, ``https://h:443``);
    5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``) and mend
       the separators they leave behind (``?&`` → ``?``, ``&&`` → ``&``,
       trailing ``?``/``&``);
    6. collapse a bare root path: ``scheme://host/`` → ``scheme://host``.
    """
    u = F.trim(url)
    # 2. lowercase scheme://authority, keep the rest as-is
    auth = F.regexp_extract(u, _AUTH, 0)
    rest = F.substring(u, F.length(auth) + 1, F.length(u))
    u = F.concat(F.lower(auth), rest)
    # 3. fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 4. default ports (no lookahead — RE2/oracle-compatible)
    u = F.regexp_replace(u, r"^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    # 5. tracking params + separator repair.  The param name is anchored
    # to a ?/& boundary so 'xfbclid=…' or a 'gclid=' substring inside
    # the path never matches (an unanchored pattern would merge DISTINCT
    # urls and make crawl dedup drop non-duplicates).
    u = F.regexp_replace(u, r"([?&])(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "$1")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    # 6. bare root slash
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]*)/$", "$1")
    return u


def normalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Append ``out_col`` = canonical form of ``url_col``."""
    return df.withColumn(out_col, normalize_url_col(F.col(url_col)))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact URL-level dedup report: one row per canonical URL seen more
    than once — ``(url_norm, n_dups, keep_id)`` where ``keep_id`` is the
    smallest id (first-crawled wins, the standard recrawl policy).

    One map-side-combined aggregation on the canonical key; the payload
    never moves, only (key, id) pairs — at 100 TB this is the cheapest
    dedup pass available and runs before any content hashing.
    """
    return (
        df.select(
            normalize_url_col(F.col(url_col)).alias("url_norm"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("url_norm")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("__id").alias("keep_id"),
        )
        .where(F.col("n_dups") > 1)
    )


def host_col(url: Column) -> Column:
    """Lowercased host of a URL column: the authority minus scheme,
    userinfo, and port.  Plain regexes (no ``parse_url``) so the DuckDB
    oracle replays it exactly; NULL-free (a scheme-less string yields
    an empty host rather than a NULL that would silently pass
    filters)."""
    auth = F.regexp_extract(F.lower(F.trim(url)), _AUTH, 0)
    host = F.regexp_replace(auth, r"^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_replace(host, r"^[^@]*@", "")   # userinfo
    return F.regexp_replace(host, r":[0-9]+$", "")  # port


def domain_filter(
    df: DataFrame,
    blocklist: DataFrame | list,
    url_col: str = "url",
    mode: str = "block",
    domain_col: str = "domain",
) -> DataFrame:
    """Domain-level curation gate — the UT1-blocklist/allowlist stage
    every crawl pipeline runs before spending content-hash or model
    compute on a page.  A row matches when its URL's host equals a
    listed domain OR sits under it (``a.b.example.com`` matches
    ``example.com`` — the standard blocklist semantic, so one entry
    covers every subdomain).  ``mode='block'`` keeps non-matching rows;
    ``mode='allow'`` keeps matching rows.

    Scale shape: the host explodes into its SUFFIX CHAIN (at most
    #labels slim rows, ~4-6 in practice) and matching is ONE equi-join
    against the broadcast list — never a per-row regex scan over the
    list (UT1 is millions of entries; list-length-times-corpus regex
    work is the naive killer).  Rows ride through untouched; only
    (url, suffix) pairs shuffle — and with the list broadcast, nothing
    shuffles at all.
    """
    if mode not in ("block", "allow"):
        raise ValueError("mode must be block|allow")
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame(
            [(d,) for d in blocklist], f"{domain_col} string"
        )
    entries = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("__sfx")).distinct()
    )
    labels = F.split(host_col(F.col("__u")), r"\.")
    suffix_chain = F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )
    hits = (
        df.select(F.col(url_col).alias("__u"))
        .withColumn("__sfx", F.explode(suffix_chain))
        .join(entries, "__sfx", "left_semi")
        .select(F.col("__u"))
        .distinct()
    )
    how = "left_anti" if mode == "block" else "left_semi"
    return df.join(hits.withColumnRenamed("__u", url_col), url_col, how)


def frontier_schedule(
    urls: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    per_host_delay_s: float = 1.0,
    max_per_host: int | None = None,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: assign every URL a
    host-local fetch slot so no host is hit more often than once per
    ``per_host_delay_s`` — the core constraint of a web crawler's
    scheduler (Mercator/Heritrix queue discipline).

    Within a host, URLs are served highest-``priority_col`` first
    (ties and the no-priority case fall back to URL order, so the
    schedule is deterministic); ``rank_in_host`` is that 1-based order
    and ``fetch_at_s = (rank_in_host - 1) * per_host_delay_s`` is the
    earliest polite fetch time.  ``max_per_host`` truncates each host's
    queue (per-host crawl budget — the standard guard against a single
    giant site consuming the whole fetch round).

    Scale shape: ONE host-keyed window — the only shuffle.  Hosts are
    the natural partition key of a frontier and per-host queues are
    independent, so the window never needs a global sort; skew (a host
    with 100M URLs) is bounded by ``max_per_host``, exactly the knob a
    real crawler uses.  Output: ``(url, host, rank_in_host,
    fetch_at_s)``."""
    from pyspark.sql import Window

    if per_host_delay_s <= 0:
        raise ValueError("per_host_delay_s must be positive")
    if max_per_host is not None and max_per_host < 1:
        raise ValueError("max_per_host must be >= 1")
    order = (
        [F.col(priority_col).desc(), F.col(url_col).asc()]
        if priority_col
        else [F.col(url_col).asc()]
    )
    w = Window.partitionBy("host").orderBy(*order)
    out = (
        urls.withColumn("host", host_col(F.col(url_col)))
        .withColumn("rank_in_host", F.row_number().over(w))
        .withColumn(
            "fetch_at_s",
            F.round(
                (F.col("rank_in_host") - 1) * F.lit(float(per_host_delay_s)), 4
            ),
        )
    )
    if max_per_host is not None:
        out = out.filter(F.col("rank_in_host") <= max_per_host)
    return out.select(url_col, "host", "rank_in_host", "fetch_at_s")
