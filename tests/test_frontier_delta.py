"""Delta frontier storage (EngineConfig.frontier_storage="delta"):
non-snapshot rounds persist O(round batch) add/del deltas instead of the
O(frontier) snapshot, with a full snapshot every frontier_snapshot_every
rounds. Reconstruction replays the SAME remove_popped/add_candidates the
live loop applies, so the state is identical by construction — these tests
pin that equivalence end-to-end: crawl outputs vs full mode AND vs the
pure-Python replay oracle, mid-interval kill/resume, idempotence, and the
file-level claim that delta rounds actually skip the snapshot write."""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.oracle.replay import replay
from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

SPEC = SiteSpec(n_hosts=3, details_per_host=18, limit=5, related_per_host=2)


@pytest.fixture(scope="module")
def site():
    return generate_site(SPEC)


def _run(spark, site, ckpt_dir, storage, max_rounds=10_000, recrawl=None, **kw):
    sdfs = site_to_spark(spark, site)
    # use_politeness=False drops the per-host budget table so default_budget
    # really caps each round (→ long crawls for the expiry test)
    politeness = sdfs["politeness"] if kw.pop("use_politeness", True) else None
    cfg = EngineConfig(
        ckpt_dir=ckpt_dir,
        # small budget → many rounds → several deltas
        default_budget=kw.pop("default_budget", 7),
        use_bloom=True,
        bloom_partitions=2,
        frontier_storage=storage,
        frontier_snapshot_every=kw.pop("frontier_snapshot_every", 4),
        max_rounds=max_rounds,
        **kw,
    )
    eng = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], politeness, cfg,
        connectors=site["connectors"],
    )
    return eng.run(recrawl=recrawl)


def _round_layout(ck):
    snap_rounds, delta_rounds = [], []
    for d in os.listdir(ck):
        if not d.startswith("round="):
            continue
        r = int(d.split("=", 1)[1])
        names = set(os.listdir(os.path.join(ck, d)))
        (snap_rounds if "frontier" in names else delta_rounds).append(r)
    return sorted(snap_rounds), sorted(delta_rounds)


def _key(res):
    recs = sorted(
        (r["url"], r["id"], tuple(sorted((f["label"], tuple(f["values"]))
                                         for f in r["fields"])))
        for r in res.records.collect()
    )
    web = sorted((r["url"], r["text"]) for r in res.webtext.collect())
    seen = sorted(r["url_hash"] for r in res.url_seen.collect())
    return recs, web, seen


def test_delta_equals_full_and_oracle(spark, site, tmp_path):
    full = _run(spark, site, str(tmp_path / "full"), "full")
    delta = _run(spark, site, str(tmp_path / "delta"), "delta")
    assert delta.rounds == full.rounds
    assert _key(delta) == _key(full)
    # and both match the independent sequential replay
    pages = {r.url: r.html for r in site["pages"].itertuples()}
    oracle = replay(pages, site["seeds"].to_dict("records"))
    got = {r["url"]: r["text"] for r in delta.webtext.collect()}
    assert got == oracle.webtext


def test_delta_rounds_skip_snapshot_write(spark, site, tmp_path):
    ck = str(tmp_path / "layout")
    res = _run(spark, site, ck, "delta")
    assert res.rounds >= 3  # at least two non-snapshot rounds happened
    snap_rounds, delta_rounds = [], []
    for d in os.listdir(ck):
        if not d.startswith("round="):
            continue
        r = int(d.split("=", 1)[1])
        names = set(os.listdir(os.path.join(ck, d)))
        if "frontier" in names:
            snap_rounds.append(r)
            assert "frontier_add" not in names
        else:
            delta_rounds.append(r)
            assert {"frontier_add", "frontier_del"} <= names
    assert delta_rounds, "every round wrote a snapshot — delta mode inert"
    assert all(r % 4 == 0 for r in snap_rounds)
    assert all(r % 4 != 0 for r in delta_rounds)


def test_auto_crosses_threshold_and_matches_full(spark, site, tmp_path):
    """frontier_storage="auto" (the at-scale DEFAULT) engages delta commits
    once the driver-known frontier bound crosses frontier_delta_threshold —
    the engine must then reload/resume through the replay path even though
    the config string is not "delta" (round-3 verdict: the literal-string
    checks crashed the first auto-engaged delta round)."""
    ck = str(tmp_path / "auto")
    res = _run(spark, site, ck, "auto", frontier_delta_threshold=10)
    full = _run(spark, site, str(tmp_path / "full_a"), "full")
    assert res.rounds == full.rounds
    assert _key(res) == _key(full)
    # layout proof the threshold actually engaged mid-run: delta rounds
    # exist, and round 0 (below threshold) wrote a snapshot
    snap_rounds, delta_rounds = _round_layout(ck)
    assert 0 in snap_rounds
    assert delta_rounds, "auto mode never engaged delta commits"


def test_auto_kill_resume_after_crossing(spark, site, tmp_path):
    """Kill an auto-mode crawl after the delta threshold engaged (latest
    committed round has NO frontier snapshot), then resume: the resume path
    must reconstruct from snapshot+deltas keyed on what the checkpoint
    contains, not on the config string."""
    ck = str(tmp_path / "auto_kr")
    _run(spark, site, ck, "auto", frontier_delta_threshold=10, max_rounds=3)
    snap_rounds, delta_rounds = _round_layout(ck)
    assert delta_rounds, "precondition: the kill landed before delta engaged"
    assert max(snap_rounds + delta_rounds) in delta_rounds, (
        "precondition: latest committed round must be a delta round"
    )
    res = _run(spark, site, ck, "auto", frontier_delta_threshold=10)
    full = _run(spark, site, str(tmp_path / "full_b"), "full")
    assert _key(res) == _key(full)


def test_auto_recrawl_rides_delta(spark, site, tmp_path):
    """Run-start recrawl additions must be armed for delta persistence in
    auto mode too: with a long snapshot interval, the recrawl round commits
    only add/del deltas, and the end-of-round replay reconstructs the
    frontier from them — unarmed pending rows (the round-3 bug) would drop
    every recrawl URL beyond the first round's per-host budget."""
    kw = dict(frontier_delta_threshold=5, frontier_snapshot_every=100)
    ck = str(tmp_path / "auto_rc")
    first = _run(spark, site, ck, "auto", **kw)
    # 12 urls on ONE host with budget 7: the recrawl needs ≥2 rounds, so
    # the second round's pops only exist if the add delta carried them
    urls = [(f"http://h0.example.test/record/{i}", "c0") for i in range(1, 13)]
    rc = spark.createDataFrame(urls, "url string, connector_id string")
    second = _run(spark, site, ck, "auto", recrawl=rc, **kw)
    refetched = second.fetch_log.where(
        (F.col("round") >= first.rounds) & (F.col("status") == 200)
    ).select("url").collect()
    assert sorted(r["url"] for r in refetched) == sorted(u for u, _ in urls)
    assert second.records.count() == first.records.count() + len(urls)


def test_delta_kill_resume_mid_interval(spark, site, tmp_path):
    ck = str(tmp_path / "resume")
    # kill after 3 rounds: rounds 1,2 are delta commits (snapshot only at 0)
    _run(spark, site, ck, "delta", max_rounds=3)
    assert not os.path.exists(os.path.join(ck, "round=3"))
    res = _run(spark, site, ck, "delta")  # resume to completion
    full = _run(spark, site, str(tmp_path / "ref"), "full")
    assert _key(res) == _key(full)
    # idempotence: a third run over the complete checkpoint adds nothing
    n = res.records.count()
    res2 = _run(spark, site, ck, "delta")
    assert res2.records.count() == n


def test_delta_expiry_bounds_history_and_resumes(spark, site, tmp_path):
    """frontier_expire_intervals=2: over a long delta crawl the number of
    retained frontier snapshots stays ≤ 2 and add/del dirs only survive
    at-or-after the oldest kept snapshot (bounded checkpoint storage);
    output deltas are untouched, a kill/resume from the latest round still
    reconstructs correctly, and the recorded horizon matches the layout."""
    from crawler_spark.plans.checkpoint import Checkpointer

    ck = str(tmp_path / "expiry")
    # budget 3 → a long crawl; snapshot every 2 rounds → several expiry
    # opportunities; kill mid-run, then resume past expired history
    kw = dict(default_budget=3, use_politeness=False)
    _run(spark, site, ck, "delta", frontier_snapshot_every=2,
         frontier_expire_intervals=2, max_rounds=9, **kw)
    res = _run(spark, site, ck, "delta", frontier_snapshot_every=2,
               frontier_expire_intervals=2, **kw)
    full = _run(spark, site, str(tmp_path / "ref_e"), "full", **kw)
    assert _key(res) == _key(full)

    cp = Checkpointer(ck)
    snaps = [r for r in cp.committed_rounds() if cp.has_table(r, "frontier")]
    assert len(snaps) <= 2, snaps
    horizon = cp.frontier_horizon()
    assert horizon is not None and horizon == snaps[0]
    for r in cp.committed_rounds():
        if r < horizon:
            # frontier history expired, crawl OUTPUT deltas retained
            assert not cp.has_table(r, "frontier_add")
            assert not cp.has_table(r, "frontier_del")
            assert not cp.has_table(r, "frontier")
            assert cp.has_table(r, "records_delta")
            assert cp.has_table(r, "seen_delta")
