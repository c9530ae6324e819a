"""Change-rate revisit scheduling: stats semantics, the Cho–Garcia-Molina
estimator numpy-pinned, and the due-filter."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.revisit import (
    change_rate_stats,
    due_for_revisit,
    estimate_change_rate,
)

T0 = dt.datetime(2024, 1, 1)


def _hist(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(seconds=s), fp, i)
         for i, (u, s, fp) in enumerate(rows)],
        "url string, ts timestamp, fp string, fetch_id long",
    )


def _stats(spark, rows):
    return {
        r["url"]: r
        for r in change_rate_stats(
            _hist(spark, rows), order_col="fetch_id"
        ).collect()
    }


def test_change_counting(spark):
    rows = [
        ("a", 0, "x"), ("a", 100, "x"), ("a", 200, "y"), ("a", 300, "y"),
        ("b", 0, "p"), ("b", 50, "q"), ("b", 60, "r"),
        ("c", 10, "z"),
    ]
    s = _stats(spark, rows)
    assert (s["a"]["n_visits"], s["a"]["n_changes"]) == (4, 1)
    assert s["a"]["span_secs"] == 300
    assert s["a"]["change_ratio"] == 1 / 3
    assert (s["b"]["n_visits"], s["b"]["n_changes"]) == (3, 2)
    assert s["b"]["change_ratio"] == 1.0
    # single visit: no change possible, ratio 0 via the max(n-1,1) guard
    assert (s["c"]["n_visits"], s["c"]["n_changes"]) == (1, 0)
    assert s["c"]["change_ratio"] == 0.0


def test_tie_break_is_deterministic(spark):
    # two visits at the SAME timestamp: fetch_id orders them
    rows = [("a", 0, "x"), ("a", 0, "y"), ("a", 5, "y")]
    s = _stats(spark, rows)
    assert s["a"]["n_changes"] == 1  # x->y at the tie, y->y after


def test_estimator_matches_numpy(spark):
    rows = [("a", i * 86400, "v" + str(i // 3)) for i in range(10)]
    stats = change_rate_stats(_hist(spark, rows), order_col="fetch_id")
    got = {r["url"]: r for r in estimate_change_rate(stats).collect()}["a"]
    n, span = 10, 9 * 86400
    changes = sum(1 for i in range(1, 10) if i // 3 != (i - 1) // 3)
    r = min(changes / (n - 1), (n - 1 - 0.5) / (n - 1))
    mean_gap_days = span / (n - 1) / 86400.0
    lam = -math.log(1.0 - r) / mean_gap_days
    assert got["lambda_per_day"] == pytest.approx(lam, rel=1e-12)
    assert got["revisit_secs"] == max(3600, min(int(86400.0 / lam),
                                                90 * 24 * 3600))


def test_estimator_edge_cases(spark):
    rows = [
        ("never", 0, "x"), ("never", 100, "x"), ("never", 200, "x"),
        ("always", 0, "a"), ("always", 100, "b"), ("always", 200, "c"),
        ("once", 0, "x"),
    ]
    stats = change_rate_stats(_hist(spark, rows), order_col="fetch_id")
    got = {r["url"]: r for r in estimate_change_rate(stats).collect()}
    # no change observed -> unknown rate -> max interval
    assert got["never"]["lambda_per_day"] is None
    assert got["never"]["revisit_secs"] == 90 * 24 * 3600
    # single visit -> max interval
    assert got["once"]["revisit_secs"] == 90 * 24 * 3600
    # changes every visit -> capped ratio keeps lambda finite, interval
    # clamps to the floor
    assert got["always"]["lambda_per_day"] > 0
    assert got["always"]["revisit_secs"] == 3600


def test_due_filter(spark):
    sched = spark.createDataFrame(
        [
            ("a", T0, 3600),
            ("b", T0, 10**9),
        ],
        "url string, last_visit_ts timestamp, revisit_secs long",
    )
    due = due_for_revisit(sched, T0 + dt.timedelta(hours=2))
    assert [r["url"] for r in due.collect()] == ["a"]


def test_history_from_webtext_and_candidates(spark):
    # two runs: u1 changed between runs, u2 identical, u3 only in run 2
    wt1 = spark.createDataFrame(
        [("u1", "old text", "en", T0),
         ("u2", "stable", "en", T0)],
        "url string, text string, lang string, warc_ts timestamp",
    )
    t1 = T0 + dt.timedelta(days=1)
    wt2 = spark.createDataFrame(
        [("u1", "NEW text", "en", t1),
         ("u2", "stable", "en", t1),
         ("u3", "fresh", "en", t1)],
        "url string, text string, lang string, warc_ts timestamp",
    )
    from crawler_spark.operators.revisit import (
        revisit_recrawl_candidates,
        visit_history_from_webtext,
    )

    hist = visit_history_from_webtext([(wt1, T0), (wt2, t1)])
    assert hist.count() == 5
    # far in the future every known-changing URL is due; u2 (never seen
    # changing) and u3 (single visit) sit at the max interval
    due = revisit_recrawl_candidates(
        hist, t1 + dt.timedelta(days=2), max_interval_secs=90 * 24 * 3600
    )
    assert [r["url"] for r in due.collect()] == ["u1"]
    assert due.columns == ["url", "connector_id"]
    # ... and past the max interval even the unknowns come due
    due_all = revisit_recrawl_candidates(
        hist, t1 + dt.timedelta(days=91)
    )
    assert sorted(r["url"] for r in due_all.collect()) == ["u1", "u2", "u3"]


def test_revisit_candidates_drive_engine_recrawl(spark, tmp_path):
    """E2e: crawl → synthesize a changed second visit → the change-rate
    candidates feed CrawlEngine.run(recrawl=...) and exactly those URLs
    are re-fetched."""
    from crawler_spark.operators.revisit import (
        revisit_recrawl_candidates,
        visit_history_from_webtext,
    )
    from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
    from crawler_spark.sources.sitegen import (
        SiteSpec,
        generate_site,
        site_to_spark,
    )

    site = generate_site(SiteSpec(n_hosts=2, details_per_host=6, limit=4))
    sdfs = site_to_spark(spark, site)
    ck = str(tmp_path / "ck")
    cfg = EngineConfig(ckpt_dir=ck, default_budget=10, use_bloom=True,
                       bloom_partitions=4)
    first = CrawlEngine(spark, sdfs["pages"], sdfs["seeds"],
                        sdfs["politeness"], cfg).run()
    rounds_first = first.rounds
    wt = first.webtext

    # second visit a day later: record/3 pages changed, all else stable
    changed = F.col("url").contains("/record/3")
    wt2 = wt.select(
        "url",
        F.when(changed, F.concat(F.col("text"), F.lit(" CHANGED")))
         .otherwise(F.col("text")).alias("text"),
        "lang",
        (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
    )
    hist = visit_history_from_webtext([(wt, T0), (wt2, T0)])
    now = [r[0] for r in wt2.select(F.max("warc_ts")).collect()][0]
    cand = revisit_recrawl_candidates(
        hist, now + dt.timedelta(days=3), min_interval_secs=1
    )
    want = sorted(r["url"] for r in cand.collect())
    assert want and all("/record/3" in u for u in want)

    second = CrawlEngine(spark, sdfs["pages"], sdfs["seeds"],
                         sdfs["politeness"], cfg).run(recrawl=cand)
    refetched = sorted(
        r["url"]
        for r in second.fetch_log.where(
            (F.col("round") >= rounds_first) & (F.col("status") == 200)
        ).select("url").collect()
    )
    assert refetched == want


def test_not_modified_fill(spark):
    from crawler_spark.operators.revisit import visit_history_with_not_modified

    hist = _hist(spark, [
        ("u1", 0, "A"), ("u1", 100, "B"),   # contentful: one change
        ("u2", 0, "X"),
        ("orphan-free", 0, "Z"),
    ])
    nm = spark.createDataFrame(
        [
            ("u1", T0 + dt.timedelta(seconds=200), 10),  # 304 after B
            ("u2", T0 + dt.timedelta(seconds=50), 11),   # 304 after X
            ("u2", T0 + dt.timedelta(seconds=60), 12),   # and again
            ("ghost", T0, 13),  # 304 with NO contentful visit: dropped
        ],
        "url string, ts timestamp, fetch_id long",
    )
    merged = visit_history_with_not_modified(hist, nm)
    rows = {
        (r["url"], r["fetch_id"]): r["fp"] for r in merged.collect()
    }
    # 304 fingerprints forward-filled from the last contentful visit
    assert rows[("u1", 10)] == "B"
    assert rows[("u2", 11)] == "X" and rows[("u2", 12)] == "X"
    assert not any(u == "ghost" for u, _ in rows)
    # and the estimator sees the 304s as unchanged visits
    st = {
        r["url"]: (r["n_visits"], r["n_changes"])
        for r in change_rate_stats(merged, order_col="fetch_id").collect()
    }
    assert st["u1"] == (3, 1)   # A->B change; B->B(304) not a change
    assert st["u2"] == (3, 0)
