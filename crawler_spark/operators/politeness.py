"""Politeness: robots filtering, per-host budgets, salted host repartition.

The reference's politeness model is its strict sequentiality — one request in
flight, ever (base.js:100-112). Generalized (north_star): a per-host
``budget_per_round`` (max URLs popped per host per round — W1, SURVEY.md
§2.5), robots.txt disallow prefixes, and a **salted repartition-by-host**
(SURVEY.md §4.3.1) so one hot domain cannot serialize the whole fetch stage
while per-host ordering within a partition still lets a single worker enforce
crawl-delay for the hosts it owns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def pop_order() -> list:
    """Deterministic pop priority (W1): shallow first, then score desc (OPIC
    cash), then the parity tuple so ties break identically on any cluster
    size. (Function, not constant: Column exprs need an active session.)"""
    return [
        F.col("depth").asc(),
        F.col("score").desc(),
        F.col("seed_idx").asc(),
        F.col("page_no").asc(),
        F.col("in_page_idx").asc(),
        F.col("dfs_rank").asc(),
        F.col("url_hash").asc(),
    ]


def apply_robots(
    frontier: DataFrame,
    politeness: DataFrame,
    politeness_bytes: int | None = None,
) -> DataFrame:
    """Drop frontier rows whose path matches a disallow prefix.

    The check is a JVM ``exists(startswith)`` over the prefix array — no
    Python. ``politeness`` is broadcast when it is user config (a few
    thousand rows; ``politeness_bytes=None``) or when the caller's
    driver-known size bound fits BROADCAST_MAX_BYTES — with live robots
    acquisition the table grows to one row per PROBED HOST (millions at
    10^10-frontier scale), so past the bound the join degrades to a plain
    shuffle-hash join instead of blowing the driver.
    """
    rules = politeness.select(
        F.col("host").alias("__p_host"), F.col("disallow").alias("__disallow")
    )
    if politeness_bytes is None or politeness_bytes <= BROADCAST_MAX_BYTES:
        rules = F.broadcast(rules)
    joined = frontier.join(
        rules, frontier["host"] == F.col("__p_host"), "left"
    )
    path = F.regexp_replace(F.col("url"), r"^[a-z]+://[^/]+", "")
    blocked = robots_blocked(
        path, F.coalesce(F.col("__disallow"), F.array())
    )
    return joined.where(~blocked).drop("__p_host", "__disallow")


def robots_blocked(path: Column, rules: Column) -> Column:
    """RFC 9309 §2.2.2-2.2.3 rule matching as one JVM array-aggregate.

    ``rules`` entries are Disallow patterns, or Allow patterns prefixed
    with ``"!"`` (robots.py's encoding — paths always start with ``/``,
    so the sentinel cannot collide). Patterns may contain ``*`` (any run)
    and a trailing ``$`` (end anchor); everything else is literal. The
    longest matching pattern wins; an Allow beats a Disallow of the same
    length. Plain user-config prefix arrays are the degenerate case
    (no ``!``, no wildcards) and keep their fast ``startswith`` path.

    Priority encoding makes the tie-break free: ``2*len(body) + 1``
    for Allow vs ``2*len(body)`` for Disallow (``body`` = the pattern
    minus its trailing ``$`` anchor) — one max-aggregate over
    the (tiny) rule array, blocked iff the winner is even. Wildcard
    patterns are translated to anchored regexes inline (escape regex
    metachars, then ``*`` → ``.*``); literal patterns never touch the
    regex engine.
    """
    def entry_prio(e: Column) -> Column:
        allow = e.startswith("!")
        pat = F.when(allow, F.substring(e, 2, 1 << 30)).otherwise(e)
        anchored = pat.endswith("$")
        body = F.when(
            anchored, F.substring(pat, 1, F.length(pat) - 1)
        ).otherwise(pat)
        has_wild = body.contains("*") | anchored
        # escape regex metachars EXCEPT '*', then '*' -> '.*'
        esc = F.regexp_replace(
            body, r"([.^$+?(){}\[\]\\|])", r"\\$1"
        )
        rx = F.concat(
            F.lit("^"),
            F.replace(esc, F.lit("*"), F.lit(".*")),
            F.when(anchored, F.lit("$")).otherwise(F.lit("")),
        )
        matched = F.when(has_wild, F.rlike(path, rx)).otherwise(
            path.startswith(body)
        )
        # longest-match priority by the pattern BODY (trailing '$' is an
        # anchor, not a matched octet — counting it flipped tie-adjacent
        # outcomes vs RFC 9309's octet-length rule; round-4 ADVICE)
        prio = F.length(body) * 2 + F.when(allow, 1).otherwise(0)
        return F.when(matched, prio).otherwise(F.lit(-1))

    best = F.aggregate(
        rules,
        F.lit(-1),
        lambda acc, e: F.greatest(acc, entry_prio(e)),
    )
    return (best >= 0) & (best % 2 == 0)


#: join-back broadcast gate — mirrors BloomTable.BROADCAST_MAX_BYTES: the
#: popped key set is bounded by the round batch, but "sum of per-host
#: budgets" is unbounded in hosts, so past this estimate the semi-join
#: falls back to a plain shuffle instead of blowing the driver
BROADCAST_MAX_BYTES = 64 * 1024 * 1024
#: per-key driver estimate: 8 B url_hash + LongHashedRelation overhead
KEY_BYTES = 48


def pop_batch(
    frontier: DataFrame,
    politeness: DataFrame | None = None,
    default_budget: int = 100,
    global_batch: int | None = None,
    prune_shuffle: bool = True,
    popped_bound: int | None = None,
    politeness_bytes: int | None = None,
) -> DataFrame:
    """W1: per-host top-k by priority, then optional global cap.

    One shuffle (the window partitionBy host); the global cap is a
    ``orderBy().limit()`` → TakeOrderedAndProject (per-partition heaps +
    driver merge of k rows), NEVER a global row_number window (that would
    funnel the whole budget-bounded batch through one task).

    ``prune_shuffle`` (default): the window exchange moves ONLY the
    ordering tuple + host + url_hash (~40 B/row), not the full frontier
    row (the url string alone dominates at ~100+ B), and the surviving
    budget-bounded keys join back to the full rows afterwards. At a
    10^10-row frontier the window shuffle is the round's largest data
    movement, so ~5x less shuffle volume for a second (column-pruned,
    shuffle-free) scan of the frontier is the right trade everywhere
    except tiny frames. The join back is key-unique (J4 invariant: one
    frontier row per url_hash) and broadcast-hinted only when a
    driver-known bound on the popped batch (``popped_bound``, e.g. the
    manifest-carried frontier row count, and/or ``global_batch``) fits
    BROADCAST_MAX_BYTES — unbounded pops fall back to a shuffle semi-join.
    """
    order_cols = [
        "host", "url_hash", "depth", "score", "seed_idx", "page_no",
        "in_page_idx", "dfs_rank",
    ]
    if prune_shuffle:
        slim = frontier.select(*order_cols)
        w = Window.partitionBy("host").orderBy(*pop_order())
        ranked = slim.withColumn("__rn", F.row_number().over(w))
    else:
        w = Window.partitionBy("host").orderBy(*pop_order())
        ranked = frontier.withColumn("__rn", F.row_number().over(w))
    if politeness is not None:
        budgets = politeness.select(
            F.col("host").alias("__p_host"),
            F.col("budget_per_round").alias("__budget"),
        )
        # same gate as apply_robots: user-config politeness broadcasts,
        # a live-robots table past the driver-known byte bound does not
        if politeness_bytes is None or politeness_bytes <= BROADCAST_MAX_BYTES:
            budgets = F.broadcast(budgets)
        ranked = ranked.join(
            budgets, ranked["host"] == F.col("__p_host"), "left"
        ).drop("__p_host")
        ranked = ranked.where(
            F.col("__rn") <= F.coalesce(F.col("__budget"), F.lit(default_budget))
        ).drop("__budget")
    else:
        ranked = ranked.where(F.col("__rn") <= F.lit(default_budget))
    ranked = ranked.drop("__rn")
    if global_batch is not None:
        # TakeOrderedAndProject: each partition keeps a k-row heap, the
        # driver merges k rows total — same shape as _w2_crawl_order_rank
        ranked = ranked.orderBy(*pop_order()).limit(global_batch)
    if not prune_shuffle:
        return ranked
    # join the surviving (budget-bounded) keys back to the full rows: a
    # second column-complete scan of the frontier probed by the popped key
    # set — scans are cheap next to the full-row window exchange this
    # avoided. url_hash is unique in the frontier (J4), so row multiplicity
    # is unchanged. Broadcast only under a driver-known size bound.
    bound = popped_bound
    if global_batch is not None:
        bound = global_batch if bound is None else min(bound, global_batch)
    keys = ranked.select(F.col("url_hash").alias("__pop_h"))
    if bound is not None and bound * KEY_BYTES <= BROADCAST_MAX_BYTES:
        keys = F.broadcast(keys)
    return frontier.join(
        keys, frontier["url_hash"] == F.col("__pop_h"), "left_semi"
    )


def salted_host_repartition(
    batch: DataFrame,
    target_per_task: int = 200,
    num_partitions: int | None = None,
    salt: bool = True,
    batch_bound: int | None = None,
) -> DataFrame:
    """§4.3.1 salted repartition-by-host.

    Key = (host, xxhash64(url) % S) with S sized from the round's per-host
    counts, so a hot host (50% of URLs) spreads over ~count/target_per_task
    tasks while small hosts stay on one. ``sortWithinPartitions(host, …)``
    lets the worker that owns a host's run enforce crawl-delay serially.

    ``salt=False`` (live fetch mode): exactly ONE bucket per host, so a
    single worker owns all of a host's requests and its in-worker
    crawl-delay bound is the host's aggregate rate. Salting a live host
    across k buckets would let k workers each honor the delay independently
    — k× the allowed request rate. A rate-limited host cannot be fetched
    faster than 1/delay anyway, so the lost parallelism is not real.
    """
    # NOT persisted: with an explicit num_partitions (the round loop's
    # path) counts is consumed once, lazily, inside the broadcast join —
    # a persist here would be unpersisted below before anything
    # materializes it, making it pure bookkeeping overhead
    counts = batch.groupBy("host").count()
    if num_partitions is None:
        # explicit partition count = total salt buckets; AQE would otherwise
        # coalesce a small round back to one partition, silently serializing
        # the hot host (at scale the same expression sizes the fetch stage)
        if salt:
            row = counts.agg(
                F.sum(
                    F.greatest(
                        F.lit(1), F.ceil(F.col("count") / F.lit(target_per_task))
                    )
                )
            ).first()
            num_partitions = max(1, int(row[0] or 1))
        else:
            num_partitions = max(1, counts.count())
    # the counts frame is one row per DISTINCT HOST in the batch —
    # broadcast-sized for typical rounds, but a batch spanning millions of
    # hosts (1 URL/host at 10^10-frontier scale) would blow the driver.
    # When the caller's driver-known row bound (n_popped) exceeds the
    # broadcast budget, pay ONE exact host count (over the caller's cached
    # batch) to decide; fall back to a shuffle-hash join past the bound.
    bcast = True
    if batch_bound is not None and batch_bound * KEY_BYTES > BROADCAST_MAX_BYTES:
        bcast = counts.count() * KEY_BYTES <= BROADCAST_MAX_BYTES
    salted = batch.join(F.broadcast(counts) if bcast else counts, "host", "left")
    salt_buckets = (
        F.greatest(F.lit(1), F.ceil(F.col("count") / F.lit(target_per_task)))
        if salt
        else F.lit(1)
    )
    salted = salted.withColumn(
        "__salt", F.pmod(F.xxhash64("url"), salt_buckets).cast("int")
    ).drop("count")
    out = salted.repartition(num_partitions, F.col("host"), F.col("__salt"))
    return out.sortWithinPartitions(
        "host", "depth", "seed_idx", "page_no", "in_page_idx", "dfs_rank"
    ).drop("__salt")


# ---------------------------------------------------------------------------
# Adaptive per-host backoff: servers that answer a round's fetches with
# throttle signals (HTTP 429 Too Many Requests / 503 Service Unavailable)
# get their crawl-delay multiplied for the NEXT rounds; hosts that come
# back clean decay toward their configured delay. The reference never
# needs this (one request in flight, ever — base.js:100-112); a
# 1000-executor crawl does. AIMD-shaped: multiplicative increase on
# congestion signal, multiplicative decrease on silence.

THROTTLE_STATUSES = (429, 503)


def throttle_stats(
    fetched: DataFrame,
    min_requests: int = 4,
    ratio: float = 0.5,
    statuses: tuple = THROTTLE_STATUSES,
) -> DataFrame:
    """Per-host verdict over ONE round's fetch results:
    ``(host, n, bad, backoff, clean)``. ``backoff`` — the host sent a
    throttle status for ≥ ``ratio`` of ≥ ``min_requests`` requests;
    ``clean`` — zero throttle signals (any sample size; decay is safe).
    One map-side-combined aggregation over the already-materialized round
    batch; shuffle rows carry (host, n, bad) only."""
    per = fetched.groupBy("host").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("status").isin(*statuses), 1).otherwise(0)
        ).alias("bad"),
    )
    return per.select(
        "host",
        "n",
        "bad",
        (
            (F.col("n") >= min_requests)
            & (F.col("bad").cast("double") / F.col("n") >= ratio)
        ).alias("backoff"),
        (F.col("bad") == 0).alias("clean"),
    )
