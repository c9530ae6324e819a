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

from crawler_spark.oracle.replay import replay
from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

SPEC = SiteSpec(n_hosts=3, details_per_host=18, limit=5, related_per_host=2)


@pytest.fixture(scope="module")
def site():
    return generate_site(SPEC)


def _run(spark, site, ckpt_dir, storage, max_rounds=10_000, **kw):
    sdfs = site_to_spark(spark, site)
    cfg = EngineConfig(
        ckpt_dir=ckpt_dir,
        default_budget=7,  # small budget → many rounds → several deltas
        use_bloom=True,
        bloom_partitions=2,
        frontier_storage=storage,
        frontier_snapshot_every=4,
        max_rounds=max_rounds,
    )
    eng = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    )
    return eng.run()


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
