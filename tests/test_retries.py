"""Retry/backoff semantics (SURVEY.md §2.9, base.js:46-56): failed fetches
re-enqueue with attempts+1 and are dropped after the retry budget; the crawl
continues past them (per-record try/catch, les-arts-decoratifs.js:34-40)."""

import pytest

from crawler_spark.oracle.replay import replay
from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

DEAD = ["http://h0.example.test/record/3", "http://h0.example.test/record/7"]


@pytest.fixture(scope="module")
def site():
    s = generate_site(SiteSpec(n_hosts=2, details_per_host=10, limit=5))
    # the search pages still link these records, but the pages are gone →
    # every fetch 404s (dead links)
    s["pages"] = s["pages"][~s["pages"].url.isin(DEAD)].reset_index(drop=True)
    return s


def test_dead_links_retried_then_dropped(spark, site, tmp_path):
    pages = {r.url: r.html for r in site["pages"].itertuples()}
    oracle = replay(pages, site["seeds"].to_dict("records"), site["connectors"])
    assert all(u not in oracle.webtext for u in DEAD)

    sdfs = site_to_spark(spark, site)
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path / "ck"), default_budget=10, max_attempts=3,
    )
    res = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    ).run()

    # crawl completed around the dead links with full parity
    got = sorted(r["url"] for r in res.records.select("url").collect())
    assert got == sorted(oracle.webtext.keys())

    # each dead link was attempted exactly max_attempts times, then dropped
    log = res.fetch_log.where(res.fetch_log.status != 200).collect()
    attempts = {}
    for r in log:
        attempts[r["url"]] = attempts.get(r["url"], 0) + 1
    for u in DEAD:
        assert attempts.get(u) == 3, attempts
    # and it never landed in records or url_seen
    seen = {r["url_hash"] for r in res.url_seen.collect()}
    from pyspark.sql import functions as F
    dead_hashes = {
        r["h"]
        for r in spark.createDataFrame([(u,) for u in DEAD], "url string")
        .select(F.xxhash64("url").alias("h")).collect()
    }
    assert not (seen & dead_hashes)


def test_backoff_jump_not_masked_by_robots_blocked_rows(spark, tmp_path):
    """Robots-disallowed rows linger in the frontier with past not_before;
    the empty-pop backoff jump must ignore them and honor FUTURE retry
    rounds — pre-fix it took min(not_before) over the whole frontier,
    concluded nothing was pending, and silently dropped the retries."""
    from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
    from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

    site = generate_site(
        SiteSpec(n_hosts=1, details_per_host=6, limit=10,
                 disallow={0: ["/record/3"]})
    )
    dead_url = "http://h0.example.test/record/5"
    pages_pd = site["pages"][site["pages"].url != dead_url]
    sdfs = site_to_spark(spark, {**site, "pages": pages_pd})
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path / "ck"), default_budget=10, max_attempts=4
    )
    res = CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    ).run()
    log = res.fetch_log.collect()
    # the 404 URL exhausted its FULL retry budget (initial + 3 backoff
    # retries at rounds +1/+2/+4), i.e. the loop jumped over the gaps
    assert sum(1 for r in log if r["url"] == dead_url) == 4
    # the robots-blocked path was never fetched
    assert all("/record/3" not in r["url"] for r in log)
