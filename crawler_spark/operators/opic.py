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
