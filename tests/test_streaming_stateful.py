"""applyInPandasWithState host sessionization (SURVEY.md §2.9): sessions
close on EVENT-time quiet gaps as the watermark advances across restarts
of the same checkpointed query."""

import json
import time


def _write_batch(d, rows):
    p = d / f"b{time.time_ns()}.json"
    p.write_text("\n".join(json.dumps(r) for r in rows))


def _run_once(spark, src_dir, ckpt, name):
    from crawler_spark.streaming.stateful import host_sessions

    stream = spark.readStream.schema(
        "host string, discovered_ts timestamp"
    ).json(str(src_dir))
    sessions = host_sessions(stream, gap="30 seconds")
    got: list = []
    q = (
        sessions.writeStream.foreachBatch(
            lambda df, _eid: got.extend(df.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return got


def test_host_sessions_close_on_event_time_gap(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    # burst on h0 (3 candidates over 10 s) + one candidate on h1
    _write_batch(src, [
        {"host": "h0", "discovered_ts": "2026-01-01 00:00:00"},
        {"host": "h0", "discovered_ts": "2026-01-01 00:00:05"},
        {"host": "h0", "discovered_ts": "2026-01-01 00:00:10"},
        {"host": "h1", "discovered_ts": "2026-01-01 00:00:02"},
    ])
    out1 = _run_once(spark, src, ckpt, "sess_run1")
    assert out1 == []  # watermark hasn't passed any gap yet

    # a much later event advances the watermark past both hosts' gaps,
    # closing their sessions; it opens a fresh h0 session that stays live
    _write_batch(src, [
        {"host": "h0", "discovered_ts": "2026-01-01 00:05:00"},
    ])
    out2 = _run_once(spark, src, ckpt, "sess_run2")
    rows = {r["host"]: r for r in out2}
    assert set(rows) == {"h0", "h1"}
    h0 = rows["h0"]
    assert h0["n_candidates"] == 3
    assert h0["session_start"].second == 0 and h0["session_end"].second == 10
    assert rows["h1"]["n_candidates"] == 1


def test_host_sessions_nonutc_session_timezone(spark, tmp_path):
    """Close/timeout decisions compare event epochs to the UTC watermark
    (getCurrentWatermarkMs); a non-UTC session timezone must not skew
    them by the offset — the same two-batch scenario must close the same
    sessions with the same wall-clock values as the UTC run."""
    from datetime import datetime

    old = spark.conf.get("spark.sql.session.timeZone")
    # UTC+9: under the old naive astype('int64'), event epochs read 9h
    # LATER than truth, so end+gap stays ahead of the (true-UTC)
    # watermark and the session never closes — this test then hangs on
    # an empty second batch instead of emitting the session
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        src = tmp_path / "src_tz"
        src.mkdir()
        ckpt = tmp_path / "ckpt_tz"
        _write_batch(src, [
            {"host": "h0", "discovered_ts": "2026-01-01 00:00:00"},
            {"host": "h0", "discovered_ts": "2026-01-01 00:00:10"},
        ])
        assert _run_once(spark, src, ckpt, "tz_run1") == []
        _write_batch(src, [
            {"host": "h0", "discovered_ts": "2026-01-01 00:05:00"},
        ])
        out = _run_once(spark, src, ckpt, "tz_run2")
        assert len(out) == 1
        h0 = out[0]
        assert h0["n_candidates"] == 2
        # collect() renders driver-local (UTC) naive datetimes: Tokyo
        # 2026-01-01 00:00(+10s) == 2025-12-31 15:00(+10s) UTC — the
        # correct instants, proving the session-tz localization round-trip
        assert h0["session_start"] == datetime(2025, 12, 31, 15, 0, 0)
        assert h0["session_end"] == datetime(2025, 12, 31, 15, 0, 10)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_late_event_within_watermark_bridges_session(spark, tmp_path):
    """A session must close on the WATERMARK passing end+gap, not on merely
    observing a later event: with gap=30s and watermark=80s, an event at
    t=100s does NOT close the [t=0] session, because a late event (t=25s,
    inside the watermark delay) can still arrive and extend it. The late
    event must join the FIRST session, never the [t=100] one (their quiet
    gap is 75s > 30s)."""
    from crawler_spark.streaming.stateful import host_sessions

    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    def run_once():
        stream = spark.readStream.schema(
            "host string, discovered_ts timestamp"
        ).json(str(src))
        sessions = host_sessions(stream, gap="30 seconds",
                                 watermark="80 seconds")
        got: list = []
        q = (
            sessions.writeStream.foreachBatch(
                lambda df, _eid: got.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    out = []
    _write_batch(src, [{"host": "h0", "discovered_ts": "2026-01-01 00:00:00"}])
    out += run_once()
    _write_batch(src, [{"host": "h0", "discovered_ts": "2026-01-01 00:01:40"}])
    out += run_once()
    # late by 75s — inside the 80s watermark delay, must still count
    _write_batch(src, [{"host": "h0", "discovered_ts": "2026-01-01 00:00:25"}])
    out += run_once()
    # flush: advances the watermark far past both sessions' close points
    _write_batch(src, [{"host": "h0", "discovered_ts": "2026-01-01 00:10:00"}])
    out += run_once()

    sess = sorted(
        ((r["session_start"].minute, r["session_start"].second,
          r["session_end"].second, r["n_candidates"]) for r in out)
    )
    # [00:00:00 .. 00:00:25] n=2 (late event merged into the FIRST session)
    # and [00:01:40] n=1 — NOT [00:00:25 .. 00:01:40]
    assert sess == [(0, 0, 25, 2), (1, 40, 40, 1)], out
