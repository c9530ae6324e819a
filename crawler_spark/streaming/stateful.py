"""Custom stateful streaming operator (SURVEY.md §2.9): per-host crawl
sessions via ``applyInPandasWithState``.

The reference's sessionful connectors hold one live session per host for as
long as requests keep flowing (imatex.js:38-115 ASP.NET handshake), and its
politeness is "one request in flight". The streaming analog over the
candidate feed: group by host, accumulate arrival stats in GroupState, and
when a host goes quiet for ``gap`` of EVENT time (watermark-driven timeout,
not wall clock), emit one session-summary row and drop the state — a manual
session window, the canonical applyInPandasWithState shape.

State per host is the list of OPEN session intervals (start/end/count
triples). A session closes only once the WATERMARK passes its
``end + gap`` — an observed later event is not proof of a quiet gap,
because an out-of-order event inside the watermark delay may still arrive
and bridge it. Open intervals per host are bounded by
``watermark_delay / gap + 1`` (older intervals are closed as the watermark
sweeps past), so state stays O(live hosts) — the property that lets this
run unbounded on a cluster.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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
        StructField("starts", ArrayType(LongType())),
        StructField("ends", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
    ]
)


def _session_fn(gap_ms: int, session_tz: str):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        wm = state.getCurrentWatermarkMs()

        def _epoch_ms(series: pd.Series) -> pd.Series:
            # Arrow hands the batch naive timestamps in the SESSION
            # timezone, while getCurrentWatermarkMs() is true UTC epoch —
            # a raw astype('int64') would skew every close/timeout
            # decision by the tz offset on non-UTC sessions. Localize
            # with never-raise DST handling, then take the true epoch.
            if series.dt.tz is None:
                series = series.dt.tz_localize(
                    session_tz, ambiguous=True, nonexistent="shift_forward"
                )
            return series.astype("int64")

        def _local_ts(ms: int) -> pd.Timestamp:
            # inverse mapping for emitted rows (Spark reinterprets naive
            # results in the session timezone)
            return (
                pd.Timestamp(ms, unit="ms", tz="UTC")
                .tz_convert(session_tz)
                .tz_localize(None)
            )

        # open intervals from state + this batch's points, re-merged on the
        # event-time gap. Merging is NOT a close decision: an interval
        # closes only when the watermark has passed end + gap — a later
        # event observed in this batch does not prove the gap, since an
        # out-of-order event within the watermark delay could still arrive
        # and bridge it.
        intervals: list[list[int]] = []
        if state.exists:
            starts, ends, ns = state.get
            intervals = [[s0, e0, n0] for s0, e0, n0 in zip(starts, ends, ns)]
        if not state.hasTimedOut:
            for pdf in pdfs:
                intervals.extend(
                    [int(v) // 1_000_000] * 2 + [1]
                    for v in _epoch_ms(pdf["discovered_ts"])
                )
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged: list[list[int]] = []
        for iv in intervals:
            if merged and iv[0] - merged[-1][1] <= gap_ms:
                merged[-1][1] = max(merged[-1][1], iv[1])
                merged[-1][2] += iv[2]
            else:
                merged.append(list(iv))

        closed = [iv for iv in merged if iv[1] + gap_ms <= wm]
        open_ = [iv for iv in merged if iv[1] + gap_ms > wm]
        if open_:
            state.update((
                [iv[0] for iv in open_],
                [iv[1] for iv in open_],
                [iv[2] for iv in open_],
            ))
            # fire when the watermark passes the EARLIEST open close-point
            # (must be strictly past the current watermark to be accepted)
            state.setTimeoutTimestamp(
                max(min(iv[1] + gap_ms for iv in open_), wm + 1)
            )
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            {
                "host": [host] * len(closed),
                "session_start": [_local_ts(s0) for s0, _, _ in closed],
                "session_end": [_local_ts(e0) for _, e0, _ in closed],
                "n_candidates": [n0 for _, _, n0 in closed],
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
    session_tz = (
        candidates.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
        or "UTC"
    )
    return (
        candidates.withWatermark("discovered_ts", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            _session_fn(gap_ms, session_tz),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            # append, not update: a closed session is emitted exactly once
            # and never revised, and update mode made the result
            # unwritable to the module's own parquet/file sinks
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
