"""URL curation filters for web-corpus pipelines.

The pre-fetch / pre-ingest URL gate a Common-Crawl-style pipeline runs on
its frontier and on harvested link sets: registrable-domain blocklists
(the UT1/adult-list pattern) plus the structural junk heuristics
(calendar/session/faceted-search URL shapes) that C4/CCNet-era pipelines
apply before spending a fetch. All pure JVM column expressions — the gate
rides the frontier scan, no Python in the path.

The reference crawler has no URL gate (its ~30 connectors enumerate known
museum search pages, base.js seed configs); this belongs to the
generalized-frontier family the brief adds. Blocklist matching is a
broadcast-friendly JOIN on the registrable domain, not a regex scan per
blocked entry — a 5M-row blocklist is a broadcast hash join or a
shuffle semi-join, never 5M LIKE predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# structural-junk defaults: conservative versions of the CCNet/C4-era URL
# heuristics (long faceted-search URLs, parameter explosions, calendar
# crawler traps, session tokens)
MAX_URL_LEN = 2048
MAX_QUERY_PARAMS = 8
MAX_PATH_DEPTH = 12
MAX_PATH_DIGIT_RATIO = 0.5

_SESSION_TOKEN = r"(?i)(phpsessid|jsessionid|sessionid|sid)=[a-z0-9]"


def url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://([^/:?#]+)", 1))


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def registrable_domain(url: Column) -> Column:
    """Last two host labels — the blocklist join key. (A public-suffix-list
    lookup would be a broadcast map join on the same key; two labels is the
    deterministic sandbox stand-in.)"""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def path_depth(url: Column) -> Column:
    p = url_path(url)
    return (
        F.length(p) - F.length(F.regexp_replace(p, r"/", ""))
    ).cast("long")


def query_param_count(url: Column) -> Column:
    q = url_query(url)
    return F.when(
        q == "", F.lit(0).cast("long")
    ).otherwise(
        (F.length(q) - F.length(F.regexp_replace(q, r"&", "")) + 1).cast(
            "long"
        )
    )


def path_digit_ratio(url: Column) -> Column:
    p = url_path(url)
    n = F.length(p)
    digits = n - F.length(F.regexp_replace(p, r"[0-9]", ""))
    return F.when(n > 0, digits.cast("double") / n).otherwise(F.lit(0.0))


def has_session_token(url: Column) -> Column:
    return url.rlike(_SESSION_TOKEN)


def url_junk(
    url: Column,
    max_len: int = MAX_URL_LEN,
    max_params: int = MAX_QUERY_PARAMS,
    max_depth: int = MAX_PATH_DEPTH,
    max_digit_ratio: float = MAX_PATH_DIGIT_RATIO,
) -> Column:
    """True when the URL's SHAPE marks it a crawler trap / junk candidate —
    independent of any blocklist."""
    return (
        (F.length(url) > max_len)
        | (query_param_count(url) > max_params)
        | (path_depth(url) > max_depth)
        | (path_digit_ratio(url) > max_digit_ratio)
        | has_session_token(url)
    )


def filter_urls(
    df: DataFrame,
    url_col: str = "url",
    blocklist: DataFrame | None = None,
    max_len: int = MAX_URL_LEN,
    max_params: int = MAX_QUERY_PARAMS,
    max_depth: int = MAX_PATH_DEPTH,
    max_digit_ratio: float = MAX_PATH_DIGIT_RATIO,
) -> DataFrame:
    """Rows that survive the junk heuristics AND (when given) the domain
    blocklist. ``blocklist``: one ``domain`` column of registrable domains;
    matching is an anti-join on ``registrable_domain(url)`` — Catalyst
    broadcasts a small list and falls back to a shuffle semi-join for a
    huge one, exactly the behavior a per-entry LIKE scan can't give."""
    u = F.col(url_col)
    out = df.where(
        ~url_junk(u, max_len, max_params, max_depth, max_digit_ratio)
    )
    if blocklist is not None:
        out = out.join(
            blocklist.select(F.lower("domain").alias("__blk")),
            registrable_domain(u) == F.col("__blk"),
            "left_anti",
        )
    return out


def host_dup_stats(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    *,
    min_urls: int = 100,
    dup_ratio_threshold: float = 10.0,
) -> DataFrame:
    """Post-fetch trap detection: per-host URL-vs-content expansion.

    The shape gate above (``url_junk``) rejects URLs a trap *typically*
    emits; this is the complementary evidence-based gate — a calendar
    trap, session-id loop, or faceted-search explosion mints unbounded
    distinct URLs over a near-constant set of content fingerprints
    (IRLbot's spam/branch-cap observation, WWW'09). One map-side-combined
    groupBy(host); the result is (hosts) grain — tiny — so the flag list
    broadcasts back into the frontier gate for free.

    Returns ``(host, n_urls, n_fps, n_rows, dup_ratio, avg_depth,
    max_params, is_trap)``; ``is_trap ⇔ n_urls ≥ min_urls ∧ dup_ratio ≥
    dup_ratio_threshold``. Both ratios are single IEEE divisions of exact
    integer aggregates, so engine/oracle parity is bit-for-bit.
    """
    u = F.col(url_col)
    g = df.groupBy(url_host(u).alias("host")).agg(
        F.countDistinct(url_col).alias("n_urls"),
        F.countDistinct(fp_col).alias("n_fps"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(path_depth(u)).alias("__depth_sum"),
        F.max(query_param_count(u)).alias("max_params"),
    )
    dup_ratio = F.col("n_urls").cast("double") / F.col("n_fps")
    return g.select(
        "host",
        "n_urls",
        "n_fps",
        "n_rows",
        dup_ratio.alias("dup_ratio"),
        (F.col("__depth_sum").cast("double") / F.col("n_rows")).alias(
            "avg_depth"
        ),
        "max_params",
        (
            (F.col("n_urls") >= min_urls)
            & (dup_ratio >= dup_ratio_threshold)
        ).alias("is_trap"),
    )


# --- soft-404 detection ----------------------------------------------------
# A soft 404 is an error page served with HTTP 200: the server says OK, the
# body says "not found". Link-graph and dedup stages must drop them or every
# parked domain's template becomes a mega-duplicate-cluster and dead links
# stay in the frontier forever. Heuristic family: Bar-Yossef et al., "Sic
# transit gloria telae" (WWW 2004) probe by fetching a random sibling URL;
# offline over a crawl table we use the content-shape half of the signal
# (error phrases + abnormally small bodies), which is what the probe
# validates. Pure JVM expressions — rides the pages scan.

_SOFT404_PHRASES = (
    "page not found",
    "404 not found",
    "error 404",
    "page does not exist",
    "no longer available",
    "page you requested could not be found",
)
# one alternation, compiled once by the JVM regex engine per task
_SOFT404_RE = "(" + "|".join(p.replace(" ", "\\s+") for p in _SOFT404_PHRASES) + ")"


def soft404_phrase_hit(text: Column) -> Column:
    """True when the body contains a canonical not-found phrase
    (case-insensitive, whitespace-run tolerant)."""
    return F.lower(text).rlike(_SOFT404_RE)


def soft404_reason(
    text: Column, short_chars: int = 400
) -> Column:
    """NULL for a healthy page, else why it looks like a soft 404:

    - ``'phrase'``        — error phrase in a normal-sized body
    - ``'phrase+short'``  — error phrase AND body under ``short_chars``
      (the high-confidence bucket: real articles that merely *mention*
      "not found" are long; error templates are tiny)

    A short body alone is NOT flagged (stub pages are legitimate); the
    phrase is the anchor signal, length only upgrades confidence.
    """
    hit = soft404_phrase_hit(text)
    short = F.length(F.trim(text)) < short_chars
    return (
        F.when(hit & short, F.lit("phrase+short"))
        .when(hit, F.lit("phrase"))
        .otherwise(F.lit(None).cast("string"))
    )


def is_soft404(text: Column, short_chars: int = 400) -> Column:
    """High-confidence soft-404 flag: phrase AND short body. Computed
    directly (not via reason-string equality) so healthy pages get FALSE,
    not NULL."""
    return soft404_phrase_hit(text) & (
        F.length(F.trim(text)) < short_chars
    )
