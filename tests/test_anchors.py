"""Anchor-text aggregation: normalization, top-k tiebreak, fan-in."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.anchors import anchor_text_summary


def _links(spark, rows):
    return spark.createDataFrame(
        rows, "dst string, anchor string, src_host string"
    )


def test_normalization_and_topk(spark):
    rows = (
        # "click here" in 3 spellings -> one normalized anchor, count 3
        [("d1", "Click  Here", "h1"),
         ("d1", "click here", "h2"),
         ("d1", " CLICK\tHERE ", "h3")]
        + [("d1", "details", "h1")] * 2
        + [("d1", "rare", "h1")]
        # empty/null anchors count toward fan-in, never rank
        + [("d1", "", "h4"), ("d1", None, "h5")]
    )
    out = anchor_text_summary(_links(spark, rows), k=2).collect()
    by_rank = {r["anchor_rank"]: r for r in out}
    assert len(out) == 2
    assert by_rank[1]["anchor"] == "click here"
    assert by_rank[1]["anchor_count"] == 3
    assert by_rank[2]["anchor"] == "details"
    assert by_rank[2]["anchor_count"] == 2
    assert all(r["n_inlinks"] == 8 for r in out)
    assert all(r["n_src_hosts"] == 5 for r in out)


def test_tiebreak_is_anchor_asc(spark):
    rows = [("d", "bbb", "h1"), ("d", "aaa", "h1"), ("d", "ccc", "h1")]
    out = sorted(
        anchor_text_summary(_links(spark, rows), k=3).collect(),
        key=lambda r: r["anchor_rank"],
    )
    assert [r["anchor"] for r in out] == ["aaa", "bbb", "ccc"]


def test_k_validation(spark):
    with pytest.raises(ValueError):
        anchor_text_summary(_links(spark, [("d", "a", "h")]), k=0)


def test_window_runs_over_aggregates_not_edges(spark):
    # the rank window's child must be the (dst, anchor) aggregate — the
    # scale contract that in-degree never inflates the window input
    rows = [("d", "a", f"h{i}") for i in range(50)]
    df = anchor_text_summary(_links(spark, rows), k=1)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    win_pos = plan.find("Window")
    agg_pos = plan.find("Aggregate", win_pos)
    assert win_pos != -1 and agg_pos != -1  # an Aggregate below the Window
