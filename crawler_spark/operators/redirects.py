"""Redirect-chain resolution — collapse 3xx/rel=canonical alias chains to
their terminal URL in O(log L) shuffles (pointer jumping / path doubling).

Why the crawler needs it: a web-scale frontier is full of alias chains —
``http://host/a → https://host/a → https://www.host/a/`` — produced by 3xx
redirects recorded at fetch time and by ``<link rel="canonical">`` targets
extracted from HTML. Dedup, the URL-seen set, and the link graph should all
key on the *terminal* URL, or every hop of every chain is crawled and
stored separately. The reference follows redirects implicitly inside its
single-process HTTP client (request-per-URL, see
``/root/reference/src/crawlers/base.js`` fetch path); at 10^10 URLs the
mapping itself is a distributed table and collapsing it is a join problem.

Algorithm: pointer jumping (a.k.a. path doubling — Wyllie's list-ranking
step, classic PRAM technique). Maintain ``next(u)`` = current best-known
successor and ``hops(u)`` = chain length so far; each iteration rewrites
``next(u) ← next(next(u))`` with a single self-equi-join, doubling the
distance covered. ``ceil(log2 L) + 1`` shuffles resolve chains of
length L (the +1 lets the done-flag catch up when a jump lands exactly on
the terminal) — real redirect chains are short (browsers cap ~20), so six
rounds cover a max_hops=32 walk.

At 100 TB: each iteration is one equi-join of the mapping against itself,
shuffle-partitioned on the join key — no global structure, no driver state
beyond a one-row ``any-advanced?`` aggregate per iteration. Compare the
naive per-row walk (L sequential lookups per URL = L joins over the FULL
table): path doubling does log2(L) joins total. Cycles (redirect loops,
a real-web pathology) can never resolve; they are detected by hop-count
overflow and surfaced with ``resolved = false`` rather than looping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Resolve every source URL to its terminal redirect target.

    ``edges``: one row per redirect hop ``(src, dst)``; at most one ``dst``
    per ``src`` (a redirect is a function of the source URL — callers
    dedupe first if a host served conflicting answers over time).

    Returns ``(src_col, final_<dst_col>, hops, resolved)``:

    - ``final_<dst_col>`` — the terminal URL (a URL that is itself no
      redirect source), or the farthest URL reached when a cycle /
      over-long chain is cut at ``max_hops``;
    - ``hops`` — number of redirect hops followed (≥ 1);
    - ``resolved`` — false iff the walk was cut at ``max_hops`` without
      reaching a terminal (i.e. a redirect loop or a chain > max_hops).

    Physical shape: ceil(log2(max_hops)) + 1 self-joins on the src key,
    each a plain shuffled equi-join. No broadcast (the mapping is the big
    table), no window, no driver-side iteration over rows; the loop count
    is fixed by max_hops, not by data.

    ``checkpoint`` (default True) eagerly ``localCheckpoint``s each
    round's state. This is load-bearing, not an optimization knob: each
    doubling references the previous state TWICE (as input and as jump
    table), so without a lineage cut the logical plan — and the work Spark
    re-executes — doubles per round (2^rounds - 1 joins; round 1 would be
    recomputed 2^(rounds-1) times). With it, each round is one
    materialized join over the previous round's stored partitions — the
    standard shape for iterative DataFrame algorithms. Disable only for
    plan-inspection tests.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")

    final_col = f"final_{dst_col}"
    # state(u) = (u, cur, hops, done): cur = farthest URL known reachable
    # from u, done = cur is known terminal (joined to no further edge).
    state = edges.select(
        F.col(src_col).alias("__u"),
        F.col(dst_col).alias("__cur"),
        F.lit(1).alias("__hops"),
        F.lit(False).alias("__done"),
    )

    # Path doubling: after k iterations every chain of length <= 2^k is
    # fully resolved. Each pass joins the undone rows' frontier pointer
    # against the full state map (also keyed by __u).
    jump = state.select(
        F.col("__u").alias("__ju"),
        F.col("__cur").alias("__jcur"),
        F.col("__hops").alias("__jhops"),
    )
    rounds = 1  # +1: done-flag discovery lags the pointer by one pass
    while (1 << (rounds - 1)) < max_hops:
        rounds += 1
    for _ in range(rounds):
        advanced = (
            state.join(jump, state["__cur"] == jump["__ju"], "left")
            .select(
                "__u",
                F.coalesce("__jcur", "__cur").alias("__cur"),
                F.when(
                    F.col("__jcur").isNotNull() & ~F.col("__done"),
                    F.least(
                        F.col("__hops") + F.col("__jhops"),
                        F.lit(max_hops),
                    ),
                )
                .otherwise(F.col("__hops"))
                .alias("__hops"),
                # terminal reached when the pointer found no further edge
                (F.col("__done") | F.col("__jcur").isNull()).alias("__done"),
            )
        )
        state = (
            advanced.localCheckpoint(eager=True) if checkpoint else advanced
        )
        jump = state.select(
            F.col("__u").alias("__ju"),
            F.col("__cur").alias("__jcur"),
            F.col("__hops").alias("__jhops"),
        )

    # A row still not done after ceil(log2(max_hops)) doublings has walked
    # >= max_hops edges: a cycle or an over-long chain. Mark unresolved.
    return state.select(
        F.col("__u").alias(src_col),
        F.col("__cur").alias(final_col),
        F.least(F.col("__hops"), F.lit(max_hops)).alias("hops"),
        F.col("__done").alias("resolved"),
    )


def extract_rel_canonical(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    out_col: str = "canonical_url",
    drop_params: frozenset[str] = frozenset(),
) -> DataFrame:
    """Add each page's declared ``<link rel=canonical>`` target, resolved
    against the page URL and RFC-3986-normalized; NULL when none declared.

    Physical shape: the tag extraction is a JVM regexp
    (functions/canonicalize.py:rel_canonical_href — codegen, no Python);
    only the resolve step goes through the Arrow-vectorized canonicalizer,
    which short-circuits NULL hrefs per batch. ``html_col`` may be string
    or binary (the input_hint table carries ``html: binary``) — binary is
    decoded as UTF-8 in the JVM before the regexp.
    """
    from crawler_spark.functions.canonicalize import (
        canonicalize_urls_udf,
        rel_canonical_href,
    )

    html = F.col(html_col)
    if dict(pages.dtypes).get(html_col) == "binary":
        html = F.decode(html, "UTF-8")
    canon = canonicalize_urls_udf(drop_params)
    return pages.withColumn(
        out_col, canon(rel_canonical_href(html), F.col(url_col))
    )


def canonical_alias_map(
    pages: DataFrame,
    url_col: str = "url",
    canonical_col: str = "canonical_url",
    max_hops: int = 8,
    html_col: str | None = None,
    drop_params: frozenset[str] = frozenset(),
) -> DataFrame:
    """``<link rel=canonical>`` alias map: (url, canonical_final) for every
    page whose declared canonical differs from itself, with canonical-of-
    canonical chains collapsed (sites do chain them) and loops cut.

    With ``html_col`` set, ``canonical_col`` is first *extracted* from the
    raw HTML (``extract_rel_canonical``) instead of being required as an
    input column — one call takes a Common-Crawl-style pages table
    (url, html) straight to the collapsed alias map.

    Rows whose canonical equals the URL (self-canonical, the common case)
    are dropped before the join loop — at web scale that prunes ~90% of
    pages from the doubling passes entirely.
    """
    if html_col is not None:
        pages = extract_rel_canonical(
            pages, html_col, url_col, canonical_col, drop_params
        )
    edges = (
        pages.select(
            F.col(url_col).alias("src"), F.col(canonical_col).alias("dst")
        )
        .where(
            F.col("dst").isNotNull() & (F.col("src") != F.col("dst"))
        )
        .dropDuplicates(["src"])
    )
    out = resolve_redirects(edges, "src", "dst", max_hops=max_hops)
    return out.select(
        F.col("src").alias(url_col),
        F.col("final_dst").alias("canonical_final"),
        "hops",
        "resolved",
    )
