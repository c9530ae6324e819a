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
