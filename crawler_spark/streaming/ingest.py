"""Structured-Streaming frontier ingestion (SURVEY.md §2.9).

The crawl itself is batch-iterative (north_star: "batch-iterative
BFS/priority crawl"), but the *candidate feed* — newly discovered or
externally submitted URLs (sitemaps, link donations, recrawl schedules) —
is naturally a stream. This module ingests such a stream into frontier
deltas with streaming-native semantics:

* event-time watermark on ``discovered_ts`` bounds state for late arrivals
  (the §2.9 watermark ↔ retry-budget mapping);
* ``dropDuplicatesWithinWatermark`` on ``url_hash`` dedups the in-flight
  window without unbounded state (the full URL-seen dedup happens in the
  round loop's J1 anti-join — streaming dedup only thins the feed);
* tumbling-window per-host counts feed politeness budgeting.

Sinks append parquet/Iceberg deltas that the batch round loop unions into
its frontier — exactly-once via checkpointed file sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_spark.functions.canonicalize import with_canonical_url


CANDIDATE_STREAM_SCHEMA = (
    "url string, discovered_ts timestamp, depth int, score double, "
    "connector_id string"
)


def candidates_from_stream(
    stream: DataFrame,
    watermark: str = "10 minutes",
    drop_params: frozenset[str] = frozenset(),
) -> DataFrame:
    """Raw candidate stream → canonicalized, in-window-deduped frontier rows.

    Works on any streaming DataFrame with CANDIDATE_STREAM_SCHEMA (file
    source, Kafka after ``from_json``, rate source for tests).
    """
    # the SAME canonicalize→hash→host derivation as the batch round loop
    # (with_canonical_url), so the streaming feed and the crawl share one
    # seen-set identity — re-implementing the expressions here could drift
    out = (
        with_canonical_url(stream, drop_params=drop_params)
        .withWatermark("discovered_ts", watermark)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )
    return out


def per_host_rates(candidates: DataFrame, window: str = "1 minute") -> DataFrame:
    """Tumbling-window per-host candidate counts (politeness feed)."""
    return (
        candidates.groupBy(
            F.window("discovered_ts", window).alias("w"), "host"
        )
        .agg(F.count("*").alias("n_candidates"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_candidates",
        )
    )


def start_frontier_sink(
    candidates: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Append canonical candidates to a parquet frontier-delta directory.

    ``trigger_once`` drains available input and stops (test/batch-catchup
    mode); a production feed uses a processing-time trigger instead. The
    file-sink checkpoint provides exactly-once appends across restarts —
    the streaming analog of the round loop's snapshot commits.
    """
    writer = (
        candidates.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
