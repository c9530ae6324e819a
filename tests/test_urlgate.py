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


def test_host_dup_stats_trap_detection(spark):
    from crawler_spark.functions.urlfilter import host_dup_stats

    rows = []
    # trap host: 40 distinct calendar URLs over 4 fingerprints
    for k in range(40):
        rows.append((f"http://trap.test/cal/view?d=2024-{k}", f"f{k % 4}"))
    # healthy host: 40 URLs, 40 fingerprints, deeper paths
    for k in range(40):
        rows.append((f"http://ok.test/a/b/p{k}", f"g{k}"))
    df = spark.createDataFrame(rows, "url string, fp string")
    got = {
        r["host"]: r
        for r in host_dup_stats(
            df, min_urls=30, dup_ratio_threshold=5.0
        ).collect()
    }
    t, o = got["trap.test"], got["ok.test"]
    assert t["is_trap"] and not o["is_trap"]
    assert t["n_urls"] == 40 and t["n_fps"] == 4 and t["dup_ratio"] == 10.0
    assert o["n_urls"] == 40 and o["n_fps"] == 40
    assert t["max_params"] == 1 and o["max_params"] == 0
    assert t["avg_depth"] == 2.0 and o["avg_depth"] == 3.0
    # duplicate rows inflate n_rows, not n_urls
    got2 = host_dup_stats(df.union(df.limit(5))).collect()
    by = {r["host"]: r for r in got2}
    assert by["trap.test"]["n_urls"] == 40
    assert sum(r["n_rows"] for r in got2) == 85


# --- soft-404 detection ------------------------------------------------------

def test_soft404_reason_buckets(spark):
    from crawler_spark.functions.urlfilter import is_soft404, soft404_reason

    long_pad = " lorem ipsum" * 60  # push past the short threshold
    rows = [
        (0, "Error 404 - Page Not  Found."),              # phrase+short
        (1, "This page does not exist." + long_pad),      # phrase (long)
        (2, "ok"),                                        # short, healthy
        (3, "A perfectly fine article." + long_pad),      # healthy
        (4, "the page you  requested could not be found"),# phrase+short
    ]
    df = spark.createDataFrame(rows, "i long, body string")
    out = {
        r["i"]: (r["reason"], r["flag"])
        for r in df.select(
            "i",
            soft404_reason(F.col("body")).alias("reason"),
            is_soft404(F.col("body")).alias("flag"),
        ).collect()
    }
    assert out[0] == ("phrase+short", True)
    assert out[1] == ("phrase", False)
    assert out[2] == (None, False)   # short alone never flags
    assert out[3] == (None, False)
    assert out[4] == ("phrase+short", True)
    # booleans must be real FALSE, not NULL (anti-join/filter safety)
    assert all(f is not None for _, f in out.values())
