"""OPIC-style priority cash (SURVEY.md §2.4 A7; north_star).

Abiteboul, Preda & Cobena, "Adaptive On-Line Page Importance Computation"
(WWW 2003): each crawled page distributes its cash equally over its
out-links; a page's priority is its accumulated cash. Not present in the
reference (which crawls in strict discovery order); the discovery-order
tuple stays the tiebreaker so OPIC only *reorders*, never breaks parity
checks that sort by the tuple.

Pure DataFrame aggregation: explode out-links → equal shares → groupBy dst.
Map-side partial aggregation + AQE handle the hot-page skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distribute_cash(
    parents: DataFrame,
    links_col: str = "out_urls",
    cash_col: str = "cash",
) -> DataFrame:
    """(parent cash, out-links) → per-destination cash income.

    parents: DataFrame with ``url``, ``cash_col`` and an array column of
    out-link URLs. Returns (url, cash_in).
    """
    n = F.size(F.col(links_col))
    share = F.when(n > 0, F.col(cash_col) / n).otherwise(F.lit(0.0))
    return (
        parents.where(n > 0)
        .select(F.explode(links_col).alias("url"), share.alias("__share"))
        .groupBy("url")
        .agg(F.sum("__share").alias("cash_in"))
    )


def apply_cash(frontier: DataFrame, cash_in: DataFrame) -> DataFrame:
    """Fold cash income into frontier scores (score = depth weight + cash)."""
    inc = cash_in.select(
        F.xxhash64("url").alias("__h"), F.col("cash_in")
    )
    return (
        frontier.join(inc, frontier["url_hash"] == F.col("__h"), "left")
        .withColumn("score", F.col("score") + F.coalesce(F.col("cash_in"), F.lit(0.0)))
        .drop("__h", "cash_in")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Offline PageRank over an edge list — the batch complement to OPIC's
    online cash for frontier prioritization (Page et al. 1999; Common-Crawl
    -style harmonic/rank scoring feeds the same `score` column OPIC does).

    Fixed ``n_iter`` power iterations of the random-surfer model, dangling
    mass redistributed uniformly so ranks always sum to 1:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/deg(u) + dangling/N)

    Shapes for scale: contributions are one explode-free join + hash
    aggregation per iteration (shuffle keyed by dst); the dangling mass is
    a 1-row aggregate CROSS-JOINED back (broadcast, no driver action); per-
    iteration ``localCheckpoint`` truncates the otherwise exponentially
    deepening lineage. N and out-degrees are computed once. Hot pages
    (in-degree skew) ride the map-side partial aggregation + AQE, same as
    `distribute_cash`.

    Returns (id, rank) with ranks UNROUNDED — callers compare/round as
    needed. Deterministic up to float-sum ordering (~1e-15), which a 6-dp
    round absorbs.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("__deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("id")
            .agg(F.sum("__c").alias("__contrib"))
        )
        # dangling mass: rank parked on nodes with no out-edges — a 1-row
        # aggregate broadcast back so ranks keep summing to 1
        dang = (
            ranks.join(deg, ranks["id"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__contrib"), F.lit(0.0))
                        + F.col("__dm") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
