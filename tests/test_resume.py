"""Checkpoint/resume + politeness regression tests (SURVEY.md §5.2 item 4,
§4.3.4; north_rule "resumable from checkpoint").

Also pins the round-batch seen-set fix: a URL fetched in round k and
rediscovered from a page fetched in the same round must NOT be fetched
again (the Bloom sidecar only covers committed rounds, so the round batch
needs its own exact anti-join — see rounds.py).
"""

from collections import Counter

import pytest

from crawler_spark.oracle.replay import replay
from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

# budget 10 / 3 hosts / limit 6 reproduces same-round rediscovery of related
# records (the configuration that exposed the duplicate-fetch bug)
SPEC = SiteSpec(n_hosts=3, details_per_host=20, limit=6)


@pytest.fixture(scope="module")
def site():
    return generate_site(SPEC)


@pytest.fixture(scope="module")
def oracle(site):
    pages = {r.url: r.html for r in site["pages"].itertuples()}
    return replay(pages, site["seeds"].to_dict("records"))


def _engine(spark, sdfs, ckpt_dir, **kw):
    cfg = EngineConfig(
        ckpt_dir=ckpt_dir, default_budget=10, use_bloom=True,
        bloom_partitions=4, **kw,
    )
    return CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg
    )


def test_kill_resume_reaches_identical_state(spark, site, oracle, tmp_path):
    sdfs = site_to_spark(spark, site)
    ck = str(tmp_path / "ck")
    killed = _engine(spark, sdfs, ck, max_rounds=3).run()
    assert killed.rounds == 3  # stopped mid-crawl

    resumed = _engine(spark, sdfs, ck).run()
    urls = [r["url"] for r in resumed.records.select("url").collect()]
    # no duplicate fetches across the kill/resume boundary (bug regression)
    assert {u: c for u, c in Counter(urls).items() if c > 1} == {}
    assert sorted(urls) == sorted(oracle.webtext.keys())

    # webtext byte parity survives resume
    wt = {r["url"]: r["text"] for r in resumed.webtext.collect()}
    assert wt == oracle.webtext

    # idempotent re-run of a complete checkpoint adds nothing
    rerun = _engine(spark, sdfs, ck).run()
    assert rerun.records.count() == resumed.records.count()


@pytest.fixture(scope="module")
def fresh_result(spark, site, tmp_path_factory):
    sdfs = site_to_spark(spark, site)
    return _engine(
        spark, sdfs, str(tmp_path_factory.mktemp("ck_fresh"))
    ).run()


def test_fresh_run_has_no_duplicate_fetches(fresh_result):
    res = fresh_result
    urls = [r["url"] for r in res.records.select("url").collect()]
    assert {u: c for u, c in Counter(urls).items() if c > 1} == {}
    # fetch_log also fetches each ok URL exactly once
    log_urls = [
        r["url"]
        for r in res.fetch_log.where("status = 200").select("url").collect()
    ]
    assert {u: c for u, c in Counter(log_urls).items() if c > 1} == {}


def test_robots_disallow_never_crawled(spark, tmp_path):
    site = generate_site(
        SiteSpec(n_hosts=2, details_per_host=10, limit=5,
                 disallow={0: ["/record/1"]})
    )
    sdfs = site_to_spark(spark, site)
    res = _engine(spark, sdfs, str(tmp_path / "ck")).run()
    urls = [r["url"] for r in res.records.select("url").collect()]
    # /record/1 prefix covers record/1 and record/1x — none may appear for h0
    assert not [u for u in urls if "h0.example.test/record/1" in u]
    # other host unaffected
    assert any("h1.example.test/record/1" in u for u in urls)


def test_per_host_budget_respected(fresh_result):
    # every round's per-host fetch count ≤ budget (10)
    from pyspark.sql import functions as F

    host = F.regexp_extract("url", r"http://([^/]+)/", 1)
    per = (
        fresh_result.fetch_log.groupBy("round", host.alias("host"))
        .count()
        .collect()
    )
    assert per and all(r["count"] <= 10 for r in per)
