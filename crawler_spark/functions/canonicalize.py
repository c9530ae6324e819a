"""URL canonicalization (SURVEY.md §2.8 F1).

Reference anchors: null-safe ``url.resolve`` wrapping (met-museum.js:8-11,
record.js:44-46) and query-param stripping (versailles.js:156-187 strips
``width``/``height``/``bg`` from IIIF thumb URLs). Generalized here to full
RFC-3986 syntax-based normalization:

* scheme + host lowercased,
* default ports stripped (http:80, https:443),
* dot-segments removed (RFC 3986 §5.2.4),
* percent-encodings of unreserved characters decoded, others uppercased,
* empty path → "/",
* fragment dropped (never part of the fetchable resource),
* configurable query-param drop-list (cache busters / resize params),
* query left in original order otherwise (reference servers are
  order-sensitive; sorting would change fetch identity).

The pure function is property-tested (idempotence) in
``tests/test_canonicalize.py``; the Spark-facing entry points are an
Arrow-vectorized pandas UDF plus ``F.xxhash64`` for the 64-bit key
(JVM-side, no Python in the hash path).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORT = {"http": "80", "https": "443"}
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _norm_pct(s: str) -> str:
    """Decode %XX of unreserved chars; uppercase the hex of the rest."""

    def repl(m: re.Match[str]) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # preserve trailing slash behaviour of ./.. segments
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def canonicalize_url(
    url: str | None,
    base: str | None = None,
    drop_params: frozenset[str] = frozenset(),
) -> str | None:
    """Pure RFC-3986 syntax-based normalization; None-safe (record.js:44-46).

    Idempotent: ``canonicalize_url(canonicalize_url(u)) == canonicalize_url(u)``.
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    if base:
        url = urljoin(base, url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None  # non-fetchable (mailto:, javascript:, data:)
    try:
        # .hostname/.port are lazy properties that can themselves raise on
        # malformed netlocs (e.g. 'http://0::') — found by fuzzing
        host = parts.hostname or ""
        port = parts.port
    except ValueError:
        return None
    if not host:
        return None
    host = host.lower().rstrip(".")
    if not host.isascii():
        # IDN: a Unicode host and its punycode twin are ONE resource —
        # normalize to the ASCII (xn--) form the wire actually uses
        # (RFC 3987 -> RFC 3490 ToASCII; ascii hosts, incl. already-
        # encoded xn-- labels, pass through untouched so the function
        # stays idempotent)
        try:
            host = host.encode("idna").decode("ascii").lower()
        except UnicodeError:
            return None  # unencodable label: not fetchable
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT.get(scheme):
        netloc = f"{host}:{port}"
    # guard the two regex passes and the segment walk behind C-speed
    # substring probes: a '.'-free path can't have dot segments ('/..'
    # contains '/.'), and '%'-free strings are _norm_pct fixed points —
    # measured 1.5x on the common no-dot-no-escape messy URL
    path = parts.path
    if "/." in path:
        path = _remove_dot_segments(path)
    if "%" in path:
        path = _norm_pct(path)
    path = path or "/"
    query = parts.query
    if "%" in query:
        query = _norm_pct(query)
    if query and drop_params:
        kept = [
            kv
            for kv in query.split("&")
            if kv and kv.split("=", 1)[0] not in drop_params
        ]
        query = "&".join(kept)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out


def host_of(url: str | None) -> str | None:
    """Registrable host of an (already canonical) URL; None-safe."""
    if not url:
        return None
    try:
        return urlsplit(url).hostname
    except ValueError:
        return None


# Fast-path predicate: a URL matching this (plus the vector checks below) is
# PROVABLY a fixed point of canonicalize_url, so the whole row skips the
# per-element Python loop. Conservative on purpose — any doubt (explicit
# port, %-escape, '#', dot-segments, uppercase host, base to resolve,
# droppable query) falls back to the slow path, so a false negative costs
# speed, never correctness. At steady state most frontier URLs were emitted
# by this very canonicalizer, so the fast path covers the bulk.
_FAST_RE = re.compile(
    r"^https?://"
    r"[a-z0-9-]+(?:\.[a-z0-9-]+)*"  # lowercase host, no trailing/empty label
    r"/[A-Za-z0-9\-._~!$&'()*+,;=:@/]*"  # path: unreserved+sub-delims, no %/#
    # \Z, not $: '$' would match BEFORE a trailing newline, letting
    # "http://h.io/\n" take the fast path unstripped while the slow path
    # trims it — two url_hash identities for one resource
    r"(?:\?[A-Za-z0-9\-._~!$&'()*+,;=:@/?]*)?\Z",
    re.ASCII,
)


def _canonical_fixed_point_mask(url: pd.Series, base: pd.Series) -> pd.Series:
    """Rows that are provably already canonical (vectorized str ops only)."""
    mask = url.str.match(_FAST_RE, na=False)
    # dot-segments would be rewritten — checked on the PATH part only:
    # whole-string endswith misses a terminal dot-segment followed by a
    # query ("/a/..?x=1"), which the slow path rewrites, so fast/slow would
    # give the same resource two url_hash identities. (_FAST_RE guarantees
    # the first '?' starts the query; dot-segments inside the query are
    # NOT rewritten by canonicalize_url, so restricting to the path is
    # also the tighter, still-correct check.)
    path = url.str.split("?", n=1).str[0]
    mask &= ~path.str.contains("/./", regex=False, na=True)
    mask &= ~path.str.contains("/../", regex=False, na=True)
    mask &= ~(
        path.str.endswith("/.", na=True) | path.str.endswith("/..", na=True)
    )
    # empty query would be dropped
    mask &= ~url.str.endswith("?", na=True)
    # a base might resolve the url differently
    mask &= base.isna() | (base == "")
    return mask


def _canonicalize_batch(
    url: pd.Series, base: pd.Series, drop_params: frozenset[str]
) -> pd.Series:
    # The slow path stays a per-element loop BY MEASUREMENT, not neglect: a
    # staged-vectorized variant (one regex extract + pandas str-op
    # normalization + per-substring fallbacks) was built, property-pinned,
    # and benched at 0.8-1.0x the loop on worst-case messy URLs — pandas
    # object-dtype .str ops are Python-level loops internally, so 14 series
    # passes cost more than one fused pass. The equivalence tests it added
    # (tests/test_canonicalize.py::test_vectorized_messy_path_equals_pure)
    # are kept pinning THIS implementation.
    mask = _canonical_fixed_point_mask(url, base)
    if drop_params:
        # any query at all might carry a droppable param → slow path
        mask &= ~url.str.contains("?", regex=False, na=True)
    res = pd.Series(index=url.index, dtype="object")
    res[mask] = url[mask]
    # NULL in → NULL out without touching the per-element loop (dominant
    # case when canonicalizing sparse columns, e.g. rel=canonical hrefs)
    nul = url.isna()
    if nul.any():
        res[nul] = None
    slow = ~mask & ~nul
    if slow.any():
        res[slow] = [
            canonicalize_url(u, b, drop_params)
            for u, b in zip(url[slow], base[slow])
        ]
    return res


def canonicalize_urls_udf(drop_params: frozenset[str] = frozenset()):
    """Arrow-vectorized canonicalizer: (url, base) -> canonical url.

    One pandas UDF call handles a whole Arrow batch; already-canonical rows
    are detected with vectorized string ops and bypass the per-element
    Python loop entirely (the loop is the worst-scaling stage in the bench
    when every URL is messy)."""

    @pandas_udf(StringType())
    def _canon(url: pd.Series, base: pd.Series) -> pd.Series:
        return _canonicalize_batch(url, base, drop_params)

    return _canon


def canonicalize_urls_by_connector_udf(
    params_by_connector: dict[str, frozenset],
):
    """(url, base, connector_id) -> canonical url, applying each row's own
    connector ``drop_params`` — the exact set ``extract_links`` used for
    that row's link-discovered URLs, so an alias target (3xx landing,
    rel=canonical href) canonicalizes to the identical xxhash64 seen-key
    as its link-discovered form. Rows whose connector is unknown (or a
    NULL connector_id) fall back to no param stripping.

    When no connector strips params at all, this degrades to the plain
    single-set UDF — no per-batch groupby cost on the common path."""
    if not any(params_by_connector.values()):

        @pandas_udf(StringType())
        def _canon_plain(
            url: pd.Series, base: pd.Series, connector_id: pd.Series
        ) -> pd.Series:
            return _canonicalize_batch(url, base, frozenset())

        return _canon_plain

    @pandas_udf(StringType())
    def _canon(
        url: pd.Series, base: pd.Series, connector_id: pd.Series
    ) -> pd.Series:
        res = pd.Series(index=url.index, dtype="object")
        for cid, idx in url.index.groupby(connector_id.fillna("")).items():
            dp = params_by_connector.get(cid, frozenset())
            res.loc[idx] = _canonicalize_batch(
                url.loc[idx], base.loc[idx], dp
            )
        return res

    return _canon


def url_host(url: Column) -> Column:
    """Host column. Pure Spark SQL (stays in whole-stage codegen):
    ``parse_url`` handles scheme://host[:port]/..."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    return host


def url_hash(url: Column) -> Column:
    """64-bit URL key — JVM-side xxhash64 (north_star: 'xxhash64')."""
    return F.xxhash64(url)


def with_canonical_url(
    df,
    url_col: str = "url",
    base_col: str | None = None,
    drop_params: frozenset[str] = frozenset(),
    out_col: str = "url",
):
    """Add canonical url + url_hash + host columns.

    The canonicalizer is the only Python here; host + hash are JVM
    expressions so the downstream join keys never leave codegen.
    """
    canon = canonicalize_urls_udf(drop_params)
    base = F.col(base_col) if base_col else F.lit(None).cast("string")
    df = df.withColumn(out_col, canon(F.col(url_col), base))
    df = df.where(F.col(out_col).isNotNull())
    df = df.withColumn("url_hash", url_hash(F.col(out_col)))
    df = df.withColumn("host", url_host(F.col(out_col)))
    return df


# --- <link rel=canonical> extraction ---------------------------------------
#
# Pages declare their preferred URL in a head tag; a web-scale dedup/index
# pipeline keys on it (the reference's single-page crawlers never need to —
# they fetch exactly the record URLs their connectors construct, see e.g.
# /root/reference/src/crawlers/base.js request path — but Common-Crawl-style
# corpora are full of alias URLs pointing at one canonical). Extraction is a
# pure JVM regexp over the raw HTML — no DOM parse, no Python — so it runs
# inside whole-stage codegen during the same scan that computes fingerprints.
# Both attribute orders are handled; the first matching tag wins (browser
# behavior). Patterns avoid lookarounds so the DuckDB (RE2) oracle can run
# the *identical* pattern strings.

# rel before href / href before rel; values quoted either way or bare.
_REL_CANON_A = (
    r"""(?i)<link[^>]*rel\s*=\s*["']?canonical\b[^>]*"""
    r"""href\s*=\s*["']?([^"'\s>]+)"""
)
_REL_CANON_B = (
    r"""(?i)<link[^>]*href\s*=\s*["']?([^"'\s>]+)[^>]*"""
    r"""rel\s*=\s*["']?canonical\b"""
)


def rel_canonical_href(html: Column) -> Column:
    """Raw ``<link rel=canonical>`` href from an HTML string column.

    NULL when the page declares none. Attribute-entity ``&amp;`` is decoded
    (the one entity that legitimately appears inside URLs in attributes);
    the result is still *unresolved* — feed it to the canonicalizer with
    the page URL as base to get an absolute, normalized target.
    """
    a = F.regexp_extract(html, _REL_CANON_A, 1)
    b = F.regexp_extract(html, _REL_CANON_B, 1)
    href = F.when(a != "", a).otherwise(F.nullif(b, F.lit("")))
    return F.regexp_replace(href, r"&amp;|&#0*38;", "&")


# --- SURT keys (Sort-friendly URI Reordering Transform) --------------------
#
# The Internet-Archive / Common-Crawl CDX index sort key: host labels
# reversed and comma-joined so one domain's URLs are contiguous under a
# lexicographic sort — `com,example)/shop/1?id=2`. Range-partitioning a
# 10^10-row URL index on this key gives per-domain locality (domain scans
# are partition-pruned range reads) without a per-domain shuffle. Pure JVM
# column expressions (regexp + split/reverse/array_join): no Python, stays
# in whole-stage codegen.
#
# Dialect (documented because SURT has minor per-tool variants): whole key
# lowercased; scheme + userinfo + fragment dropped; leading `www.` (and
# `www2.` etc.) stripped; default ports 80/443 dropped, other ports kept as
# `:port` after the reversed host; empty path → `/`; query kept verbatim
# (post-canonicalization order is fetch identity, see module docstring).


def surt_key(url: Column) -> Column:
    """CDX-style SURT sort key from a (canonicalized) URL column."""
    u = F.lower(url)
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")
    auth = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    pathq = F.regexp_replace(
        F.substring(rest, F.length(auth) + 1, F.lit(1 << 30)), r"#.*$", ""
    )
    pathq = F.when(pathq == "", F.lit("/")).otherwise(pathq)
    auth = F.regexp_replace(auth, r"^[^@]*@", "")  # userinfo
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    host = F.regexp_replace(auth, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")
    revhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    portsfx = F.when(
        (port == "") | port.isin("80", "443"), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    return F.concat(revhost, portsfx, F.lit(")"), pathq)


def write_cdx_index(df, path: str, url_col: str = "url",
                    n_partitions: int | None = None) -> None:
    """Write a range-partitioned, within-file-sorted CDX-style URL index.

    ``repartitionByRange(surt)`` samples split points (Spark's range
    partitioner), so each output file owns a contiguous SURT range — a
    domain lookup over the written index is a key-range scan touching one
    or a few files, never a full-table scan. ``sortWithinPartitions``
    keeps each file internally ordered for merge-style consumers.
    """
    keyed = df.withColumn("surt", surt_key(F.col(url_col)))
    if n_partitions:
        keyed = keyed.repartitionByRange(n_partitions, "surt")
    else:
        keyed = keyed.repartitionByRange("surt")
    keyed.sortWithinPartitions("surt").write.mode("overwrite").parquet(path)
