"""Anchor-text aggregation — per-target summaries of the link graph's
anchor strings (the `<a>` inner text pointing at each URL).

Why a crawler/training pipeline needs it: inbound anchor text is the
classic external description of a page (used for ranking since anchors
beat on-page text for navigational queries, and in corpus construction as
a quality/topicality signal and as weak labels). The reference crawler
records per-record fields but never aggregates across pages
(/root/reference/src/crawlers/base.js writes one record per URL); at web
scale "what does the web call this URL" is a groupBy over trillions of
edges and belongs in the engine.

Shape at 100 TB: the edge table is (src_host, dst, anchor). Everything is
keyed aggregation — (dst, anchor) counts get map-side partial aggregation
(the same anchor string repeats enormously: "click here", nav labels), the
top-k window runs over the *aggregated* per-dst anchor rows (bounded by
distinct anchors per target, not by in-degree), and the exact distinct
host count is a two-level groupBy (dedupe (dst, host), then count) — no
count(distinct) over raw edges, no global window, nothing driver-side.
Hot targets (a URL with 10^9 in-links) are exactly the rows map-side
combine flattens: the shuffle carries one row per (dst, anchor) per map
partition, not per edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchor_text_summary(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    src_host_col: str = "src_host",
    k: int = 3,
) -> DataFrame:
    """Top-k anchor strings per link target, with in-link fan-in stats.

    Returns one row per (dst, surviving anchor):
    ``(dst, anchor, anchor_count, anchor_rank, n_inlinks, n_src_hosts)``
    where ``anchor_rank`` is 1..k ordered by (count desc, anchor asc) —
    the tiebreak makes the output deterministic — ``n_inlinks`` counts all
    edges into dst and ``n_src_hosts`` counts exact distinct source hosts.

    Anchors are whitespace-normalized and case-folded before counting
    ("Click  Here" == "click here"); empty/null anchors are dropped from
    the ranking but still count toward fan-in.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    dst = F.col(dst_col)
    norm = F.trim(F.regexp_replace(F.lower(F.col(anchor_col)), r"\s+", " "))

    edges = links.select(
        dst.alias("__dst"),
        norm.alias("__anchor"),
        F.col(src_host_col).alias("__host"),
    )

    # fan-in: total edges + exact distinct hosts (two-level, skew-safe:
    # the (dst, host) dedupe is itself map-side combinable)
    fanin = edges.groupBy("__dst").agg(F.count(F.lit(1)).alias("n_inlinks"))
    hosts = (
        edges.select("__dst", "__host")
        .distinct()
        .groupBy("__dst")
        .agg(F.count(F.lit(1)).alias("n_src_hosts"))
    )

    counts = (
        edges.where(F.col("__anchor").isNotNull() & (F.col("__anchor") != ""))
        .groupBy("__dst", "__anchor")
        .agg(F.count(F.lit(1)).alias("anchor_count"))
    )
    win = Window.partitionBy("__dst").orderBy(
        F.col("anchor_count").desc(), F.col("__anchor").asc()
    )
    topk = counts.withColumn(
        "anchor_rank", F.row_number().over(win)
    ).where(F.col("anchor_rank") <= k)

    return (
        topk.join(fanin, "__dst").join(hosts, "__dst")
        .select(
            F.col("__dst").alias(dst_col),
            F.col("__anchor").alias(anchor_col),
            "anchor_count",
            "anchor_rank",
            "n_inlinks",
            "n_src_hosts",
        )
    )
