"""Boilerplate removal — main-content extraction from raw HTML.

A training-data pipeline cannot feed pages to a model whole: navigation
bars, footers, cookie banners, and link farms dominate the byte count of
real web pages while carrying no prose. The standard batch approach
(jusText, Pomikálek 2011; the same block-classification family trafilatura
and Common Crawl's WET pipeline use) segments the page into block-level
chunks and keeps the ones that look like running text — long enough, and
not dominated by anchor text. The reference never needs this (its museum
connectors extract labeled fields via CSS selectors, record.js-style); a
Common-Crawl-scale webtext corpus does.

This implementation is the deterministic core of that family, expressed
ENTIRELY in Spark SQL column expressions — regexp split/extract/replace +
higher-order array functions — so it rides whole-stage codegen inside the
pages scan: no Python, no UDF, no shuffle. Per page:

1. strip ``<script>`` / ``<style>`` bodies and HTML comments (explicit
   alternation — no backreferences, so the identical pattern runs on RE2
   for the DuckDB oracle);
2. split into blocks at block-level tag boundaries (``p div td li h1-6
   section article header footer nav aside ul ol table tr blockquote
   br``…);
3. per block: anchor text = concatenated ``<a>…</a>`` bodies; visible
   text = tags stripped, entities decoded (``&amp; &lt; &gt; &quot;
   &#39; &nbsp;``), whitespace collapsed;
4. classify: KEEP when ``length(text) >= min_chars`` AND
   ``link_chars / chars <= max_link_density`` (link-farm blocks are
   mostly anchor text; prose is not);
5. ``main_text`` = kept blocks joined by ``\\n``.

Classification here is per-block and stateless (jusText's neighbor
smoothing pass trades determinism for recall on short quotes between
paragraphs; a batch pipeline prefers the reproducible core — the same
choice C4 made with line-level rules).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# identical pattern strings run on both engines (Java regex + RE2):
# inline flags only, no backreferences, no lookaround
STRIP_RE = (
    "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"
)
BLOCK_SPLIT_RE = (
    "(?i)</?(?:p|div|td|th|li|h[1-6]|section|article|header|footer|nav|"
    "aside|ul|ol|table|tr|blockquote|br|main|figure|figcaption|dl|dt|dd)"
    "\\b[^>]*>"
)
ANCHOR_RE = "(?is)<a\\b[^>]*>(.*?)</a>"
TAG_RE = "<[^>]*>"


def _decode_entities(c: Column) -> Column:
    # order matters: &amp; last, so "&amp;lt;" decodes to "&lt;" not "<"
    for src, dst in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def _visible_text(c: Column) -> Column:
    """Tags stripped, entities decoded, whitespace collapsed, trimmed."""
    t = F.regexp_replace(c, TAG_RE, " ")
    t = _decode_entities(t)
    return F.trim(F.regexp_replace(t, "\\s+", " "))


def block_stats(html: Column) -> Column:
    """Array of per-block structs ``(text, chars, link_chars)`` for an
    HTML string column — the segmentation + measurement half, exposed for
    tests and custom classifiers."""
    cleaned = F.regexp_replace(html, STRIP_RE, " ")
    blocks = F.split(cleaned, BLOCK_SPLIT_RE)
    return F.transform(
        blocks,
        lambda b: F.struct(
            _visible_text(b).alias("text"),
            F.length(_visible_text(b)).alias("chars"),
            F.length(
                _visible_text(
                    F.array_join(
                        F.regexp_extract_all(b, F.lit(ANCHOR_RE), 1), " "
                    )
                )
            ).alias("link_chars"),
        ),
    )


def extract_main_text(
    html: Column,
    min_chars: int = 40,
    max_link_density: float = 0.3,
) -> Column:
    """Main-content text of an HTML string column (see module docstring).

    Returns the kept blocks joined by newline; empty string when nothing
    qualifies (a pure-chrome page). Thresholds follow jusText's defaults
    scaled to characters.
    """
    kept = F.filter(
        block_stats(html),
        lambda s: (s["chars"] >= F.lit(min_chars))
        & (
            s["link_chars"].cast("double")
            <= F.lit(float(max_link_density)) * s["chars"].cast("double")
        ),
    )
    return F.array_join(F.transform(kept, lambda s: s["text"]), "\n")


def boilerplate_report(
    pages: DataFrame,
    html_col: str = "html",
    min_chars: int = 40,
    max_link_density: float = 0.3,
) -> DataFrame:
    """Add ``main_text`` plus the block-census columns a curation pipeline
    filters on: ``n_blocks`` (non-empty blocks seen), ``n_kept``, and
    ``content_ratio`` (kept chars / total visible chars — pages below
    ~0.3 are mostly chrome and usually droppable). One narrow projection
    over the scan; html may be string or binary."""
    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "UTF-8")
    stats = block_stats(html)
    nonempty = F.filter(stats, lambda s: s["chars"] > 0)
    kept = F.filter(
        nonempty,
        lambda s: (s["chars"] >= F.lit(min_chars))
        & (
            s["link_chars"].cast("double")
            <= F.lit(float(max_link_density)) * s["chars"].cast("double")
        ),
    )
    total_chars = F.aggregate(
        nonempty, F.lit(0), lambda acc, s: acc + s["chars"]
    )
    kept_chars = F.aggregate(kept, F.lit(0), lambda acc, s: acc + s["chars"])
    return pages.withColumns(
        {
            "main_text": F.array_join(
                F.transform(kept, lambda s: s["text"]), "\n"
            ),
            "n_blocks": F.size(nonempty),
            "n_kept": F.size(kept),
            "content_ratio": F.when(
                total_chars > 0,
                kept_chars.cast("double") / total_chars.cast("double"),
            ).otherwise(F.lit(0.0)),
        }
    )
