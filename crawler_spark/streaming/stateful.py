"""Custom stateful streaming operator (SURVEY.md §2.9): per-host crawl
sessions via ``applyInPandasWithState``.

The reference's sessionful connectors hold one live session per host for as
long as requests keep flowing (imatex.js:38-115 ASP.NET handshake), and its
politeness is "one request in flight". The streaming analog over the
candidate feed: group by host, accumulate arrival stats in GroupState, and
when a host goes quiet for ``gap`` of EVENT time (watermark-driven timeout,
not wall clock), emit one session-summary row and drop the state — a manual
session window, the canonical applyInPandasWithState shape.

State per host is O(1) (start/end/count), so state size is bounded by the
number of live hosts regardless of feed volume — the property that lets
this run unbounded on a cluster.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_candidates", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
    ]
)


def _session_fn(gap_ms: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "host": [host],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_candidates": [n],
                }
            )
            return
        pts: list[int] = []
        for pdf in pdfs:
            pts.extend(
                int(v) // 1_000_000 for v in pdf["discovered_ts"].astype("int64")
            )
        pts.sort()
        # cluster this batch's events on event-time gaps
        clusters: list[list[int]] = []  # [start_ms, end_ms, n]
        for p in pts:
            if clusters and p - clusters[-1][1] <= gap_ms:
                clusters[-1][1] = p
                clusters[-1][2] += 1
            else:
                clusters.append([p, p, 1])
        if not clusters:
            # no new rows and no timeout: nothing to do (keep state as-is)
            yield pd.DataFrame(
                {"host": [], "session_start": [], "session_end": [],
                 "n_candidates": []}
            )
            return
        closed: list[tuple[int, int, int]] = []
        if state.exists:
            start_ms, end_ms, n = state.get
            if clusters and clusters[0][0] - end_ms <= gap_ms:
                c = clusters[0]
                clusters[0] = [min(start_ms, c[0]), max(end_ms, c[1]), n + c[2]]
            else:
                # the new events (all past the stored end, watermark-bounded)
                # prove the quiet gap — the stored session closes NOW
                closed.append((start_ms, end_ms, n))
        closed.extend((c[0], c[1], c[2]) for c in clusters[:-1])
        last = clusters[-1]
        state.update((last[0], last[1], last[2]))
        # event-time timeout: fires once the WATERMARK passes end + gap
        state.setTimeoutTimestamp(last[1] + gap_ms)
        yield pd.DataFrame(
            {
                "host": [host] * len(closed),
                "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                "n_candidates": [c for _, _, c in closed],
            }
        )

    return fn


def host_sessions(
    candidates: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Candidate stream → closed per-host sessions.

    ``candidates`` needs (host, discovered_ts) columns; emits one row per
    (host, quiet-gap-closed session). Late data beyond the watermark is
    dropped by the engine before it reaches the state function.
    """
    n, unit = gap.split()
    gap_ms = int(n) * {"seconds": 1000, "minutes": 60_000}[unit.rstrip("s") + "s"]
    return (
        candidates.withWatermark("discovered_ts", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
