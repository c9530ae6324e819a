"""Engine opt-ins: webtext language backfill (EngineConfig.lang_detect)
and the per-round WARC archive mirror (EngineConfig.warc_out)."""

import os

from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark


def _run(spark, tmp_path, null_lang=False, **cfg_kw):
    from pyspark.sql import functions as F

    site = generate_site(SiteSpec(n_hosts=1, details_per_host=8, limit=4))
    sdfs = site_to_spark(spark, site)
    pages = sdfs["pages"]
    if null_lang:
        # the live-crawl shape: a lang column exists but carries nothing
        pages = pages.withColumn("lang", F.lit(None).cast("string"))
    cfg = EngineConfig(ckpt_dir=str(tmp_path / "ck"), **cfg_kw)
    res = CrawlEngine(
        spark, pages, sdfs["seeds"], sdfs["politeness"], cfg
    ).run()
    return site, res


def test_lang_detect_backfills_null_lang(spark, tmp_path):
    # NULL lang in -> NULL lang out by default
    _, base = _run(spark, tmp_path / "a", null_lang=True)
    assert all(
        r["lang"] is None for r in base.webtext.select("lang").collect()
    )
    # with lang_detect: every row classified, none NULL, same rows
    _, res = _run(spark, tmp_path / "b", null_lang=True, lang_detect=True)
    rows = res.webtext.select("url", "lang").collect()
    assert len(rows) == base.webtext.count()
    assert all(r["lang"] in ("en", "fr", "es", "und") for r in rows)
    # (the fixture's label/value jargon carries no stopwords, so 'und'
    # is the honest verdict — the point here is NULL -> classified)
    # a corpus-provided lang is never overridden by the heuristic
    _, keep = _run(spark, tmp_path / "c", lang_detect=True)
    _, plain = _run(spark, tmp_path / "d")
    assert (
        {(r["url"], r["lang"]) for r in keep.webtext.collect()}
        == {(r["url"], r["lang"]) for r in plain.webtext.collect()}
    )


def test_warc_out_archives_every_fetch_once(spark, tmp_path):
    from crawler_spark.sources.warc import warc_scan

    out = str(tmp_path / "warcs")
    site, res = _run(spark, tmp_path, warc_out=out)
    round_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("round=")
    )
    assert len(round_dirs) >= 2  # search round + detail round at least
    scanned = warc_scan(spark, out + "/round=*").collect()
    urls = [r["url"] for r in scanned]
    # each page fetched (and archived) exactly once across all rounds
    assert len(urls) == len(set(urls))
    rec_urls = {r["url"] for r in res.records.select("url").collect()}
    assert rec_urls <= set(urls)
    # archived bytes are the fixture bytes
    by_url = {r.url: bytes(r.html) for r in site["pages"].itertuples()}
    for r in scanned:
        assert bytes(r["html"]) == by_url[r["url"]]
