"""Change-rate estimation + revisit scheduling for incremental crawling.

A continuous crawler must decide *when to fetch a URL again*. The
standard model (Cho & Garcia-Molina, "Estimating frequency of change",
ACM TOIT 2003) treats each page's changes as a Poisson process with rate
λ and estimates λ from the visit history: with ``n`` visits, ``X`` visits
that observed a change, and average inter-visit gap ``Δ̄``, the
bias-reduced estimator is ``λ̂ = -ln(1 - X/n) / Δ̄`` (their §4.2; the
naive X/(nΔ̄) underestimates because multiple changes inside one gap are
seen as one). The reference crawler has no revisit policy at all — each
run re-enumerates its museum connectors from scratch (``npm start --
<museum>`` walks every search page every time); a 10^10-URL frontier
cannot afford that, so revisit scheduling is a first-class engine stage
alongside the sitemap-lastmod freshness set (plans/rounds.py
``recrawl_from_sitemaps``).

Shape at scale: the visit history is (url, ts, fingerprint) — one row per
past fetch. Change detection is a lag-window partitioned by url (each
partition is one URL's short history, thousands of independent
partitions per task), then one map-side-combinable aggregation per url.
No global window, no driver state, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def change_rate_stats(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    fp_col: str = "fp",
    order_col: str | None = None,
) -> DataFrame:
    """Per-URL change statistics from a visit history.

    ``history``: one row per past fetch with the URL, the fetch timestamp
    and a content fingerprint (any stable hash of the extracted text).
    ``order_col`` breaks timestamp ties deterministically (e.g. a fetch
    id); required for engines to agree when two visits share a timestamp.

    Returns one row per url:

    - ``n_visits``       — fetches observed
    - ``n_changes``      — visits whose fingerprint differs from the
      previous visit's (first visit is never a change)
    - ``span_secs``      — seconds between first and last visit (exact
      integer arithmetic)
    - ``last_visit_ts``  — timestamp of the most recent visit
    - ``change_ratio``   — n_changes / max(n_visits - 1, 1): one IEEE
      division of exact integers, bit-reproducible across engines

    Exactly-representable outputs only; the Poisson-rate estimate (a
    transcendental) is layered on by :func:`estimate_change_rate` and
    checked against numpy in tests rather than a SQL oracle.
    """
    order = [F.col(ts_col)]
    if order_col is not None:
        order.append(F.col(order_col))
    win = Window.partitionBy(url_col).orderBy(*order)
    prev_fp = F.lag(fp_col).over(win)
    changed = (
        prev_fp.isNotNull() & (F.col(fp_col) != prev_fp)
    ).cast("long")

    agg = (
        history.select(
            url_col,
            F.col(ts_col).alias("__ts"),
            changed.alias("__chg"),
        )
        .groupBy(url_col)
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.sum("__chg").alias("n_changes"),
            (
                F.unix_timestamp(F.max("__ts"))
                - F.unix_timestamp(F.min("__ts"))
            ).alias("span_secs"),
            F.max("__ts").alias("last_visit_ts"),
        )
    )
    denom = F.greatest(F.col("n_visits") - 1, F.lit(1))
    return agg.select(
        url_col,
        "n_visits",
        "n_changes",
        "span_secs",
        "last_visit_ts",
        (F.col("n_changes").cast("double") / denom).alias("change_ratio"),
    )


def estimate_change_rate(
    stats: DataFrame,
    min_interval_secs: int = 3600,
    max_interval_secs: int = 90 * 24 * 3600,
) -> DataFrame:
    """Cho–Garcia-Molina λ̂ and a clamped next-revisit interval.

    Input: the output of :func:`change_rate_stats`. Adds:

    - ``lambda_per_day`` — ``-ln(1 - r̂) / Δ̄`` with ``Δ̄`` the mean
      inter-visit gap in days and ``r̂`` the change ratio capped below 1
      (a URL that changed every single visit has λ̂ = ∞ under the MLE;
      the cap keeps it finite and the clamp below governs scheduling).
    - ``revisit_secs`` — 1/λ̂ clamped to [min_interval, max_interval];
      URLs with < 2 visits or zero span get the max (nothing is known).

    Transcendental (ln) — kept OUT of the oracle-checked surface; parity
    with numpy is pinned in tests/test_revisit.py.
    """
    n1 = F.col("n_visits") - 1
    mean_gap_days = F.col("span_secs").cast("double") / n1 / 86400.0
    # cap r below 1: at most (n-2)/(n-1) + half a change of mass
    r = F.least(F.col("change_ratio"), (n1 - 0.5) / n1)
    lam = F.when(
        (F.col("n_visits") >= 2)
        & (F.col("span_secs") > 0)
        & (F.col("n_changes") > 0),
        -F.log(1.0 - r) / mean_gap_days,
    )
    revisit = F.when(
        lam.isNotNull() & (lam > 0),
        F.least(
            F.greatest(
                (86400.0 / lam).cast("long"), F.lit(min_interval_secs)
            ),
            F.lit(max_interval_secs),
        ),
    ).otherwise(F.lit(max_interval_secs))
    return stats.select(
        "*",
        lam.alias("lambda_per_day"),
        revisit.alias("revisit_secs"),
    )


def due_for_revisit(
    scheduled: DataFrame,
    now_ts,
    ts_col: str = "last_visit_ts",
) -> DataFrame:
    """Filter to URLs whose revisit interval has elapsed by ``now_ts`` —
    a plain pushdown-friendly predicate over the schedule table."""
    return scheduled.where(
        F.unix_timestamp(F.col(ts_col)) + F.col("revisit_secs")
        <= F.unix_timestamp(F.lit(now_ts))
    )


def visit_history_from_webtext(
    runs: list[tuple[DataFrame, object]],
) -> DataFrame:
    """Build a (url, ts, fp, fetch_id) visit history from successive crawl
    runs' webtext tables (the input_hint shape: url, text, lang, warc_ts).

    ``runs``: (webtext_df, run_ts) per crawl run, oldest first. The
    fingerprint is xxhash64 of the extracted text — the same content hash
    family the dedup stage uses — so a revisit whose page re-renders
    byte-identically counts as unchanged. ``ts`` prefers the page's own
    warc_ts and falls back to the run timestamp; ``fetch_id`` (the run
    ordinal) is the deterministic tiebreak change_rate_stats orders by.

    A union of column-pruned scans — at scale each run is one Iceberg
    snapshot and this is a straight multi-snapshot read, no shuffle until
    the stats aggregation.
    """
    if not runs:
        raise ValueError("runs must contain at least one webtext table")
    parts = []
    for i, (wt, run_ts) in enumerate(runs):
        parts.append(
            wt.select(
                F.col("url"),
                F.coalesce(
                    F.col("warc_ts"), F.lit(run_ts).cast("timestamp")
                ).alias("ts"),
                F.xxhash64(F.coalesce(F.col("text"), F.lit(""))).alias("fp"),
                F.lit(i).cast("long").alias("fetch_id"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def visit_history_with_not_modified(
    history: DataFrame,
    not_modified: DataFrame,
) -> DataFrame:
    """Merge HTTP-304 revisits into a ``(url, ts, fp, fetch_id)`` history.

    A 304 answer proves the content at ``ts`` is byte-identical to the
    previous contentful fetch, but it ships no body — so the visit never
    reaches webtext and :func:`visit_history_from_webtext` cannot see it.
    Dropping it would bias the Cho–Garcia-Molina estimator UP (the
    cheapest possible evidence of stability is exactly the evidence a
    conditional-fetch crawl produces most of): n visits with 0 changes
    must lower λ̂, and the 304s are most of those n.

    ``not_modified`` rows: ``(url, ts, fetch_id)``. Each becomes a history
    row whose fingerprint is forward-filled from the url's last contentful
    visit (per-url window, ordered (ts, fetch_id) — same tiny-partition
    shape as change detection; no join). A 304 with no preceding
    contentful fetch (possible only if the validator sidecar outlived the
    webtext history) is dropped rather than guessed.
    """
    fp_type = dict(history.dtypes)["fp"]  # any stable hash type works
    nm = not_modified.select(
        "url", "ts", F.lit(None).cast(fp_type).alias("fp"), "fetch_id"
    )
    merged = history.select("url", "ts", "fp", "fetch_id").unionByName(nm)
    w = (
        Window.partitionBy("url")
        .orderBy("ts", "fetch_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.withColumn(
        "fp", F.last("fp", ignorenulls=True).over(w)
    )
    return filled.where(F.col("fp").isNotNull())


def revisit_recrawl_candidates(
    history: DataFrame,
    now_ts,
    connector_id: str = "revisit",
    min_interval_secs: int = 3600,
    max_interval_secs: int = 90 * 24 * 3600,
) -> DataFrame:
    """Change-rate-driven recrawl set: URLs whose Cho–Garcia-Molina
    revisit interval has elapsed by ``now_ts`` — the rows to hand to
    ``CrawlEngine.run(recrawl=...)`` ((url, connector_id) shape, which
    revokes their seen status), the estimator-driven complement to the
    sitemap-lastmod freshness set (operators/sitemaps.py
    ``sitemap_recrawl_candidates``: explicit server signal there, observed
    change history here).

    One lag-window + one aggregation over the history, then a pushdown
    predicate — no joins, no driver state.
    """
    stats = estimate_change_rate(
        change_rate_stats(history, order_col="fetch_id"),
        min_interval_secs=min_interval_secs,
        max_interval_secs=max_interval_secs,
    )
    return due_for_revisit(stats, now_ts, ts_col="last_visit_ts").select(
        "url", F.lit(connector_id).alias("connector_id")
    )
