"""Engine wiring of the URL curation gate (EngineConfig.url_junk_filter +
CrawlEngine(url_blocklist=...)): candidates drop before the seen filter;
user-supplied seeds are exempt by design (the gate guards link
DISCOVERY, not explicit operator input)."""

from pyspark.sql import functions as F

from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark


def _spec():
    return SiteSpec(n_hosts=2, details_per_host=8, limit=4)


def test_blocklist_stops_link_expansion(spark, tmp_path):
    site = generate_site(_spec())
    sdfs = site_to_spark(spark, site)
    blk = spark.createDataFrame([("example.test",)], ["domain"])
    res = CrawlEngine(
        spark,
        sdfs["pages"],
        sdfs["seeds"],
        sdfs["politeness"],
        EngineConfig(ckpt_dir=str(tmp_path / "ck")),
        url_blocklist=blk,
    ).run()
    fetched = [r["url"] for r in res.fetch_log.select("url").collect()]
    # seeds (user input) still fetch; every DISCOVERED candidate is blocked
    assert fetched and all("/search" in u for u in fetched)
    assert res.records.count() == 0

    # control: same site, no blocklist -> records crawled
    res2 = CrawlEngine(
        spark,
        sdfs["pages"],
        sdfs["seeds"],
        sdfs["politeness"],
        EngineConfig(ckpt_dir=str(tmp_path / "ck2")),
    ).run()
    assert res2.records.count() > 0


def test_junk_filter_unchanged_on_clean_site(spark, tmp_path):
    """The synthetic site has no trap-shaped URLs, so the heuristics gate
    must be a no-op there — parity with the ungated run."""
    site = generate_site(_spec())
    sdfs = site_to_spark(spark, site)
    res_gated = CrawlEngine(
        spark,
        sdfs["pages"],
        sdfs["seeds"],
        sdfs["politeness"],
        EngineConfig(ckpt_dir=str(tmp_path / "g"), url_junk_filter=True),
    ).run()
    res_plain = CrawlEngine(
        spark,
        sdfs["pages"],
        sdfs["seeds"],
        sdfs["politeness"],
        EngineConfig(ckpt_dir=str(tmp_path / "p")),
    ).run()
    a = sorted(r["url"] for r in res_gated.records.select("url").collect())
    b = sorted(r["url"] for r in res_plain.records.select("url").collect())
    assert a == b and a
