"""Engine wiring of soft-404 suppression (EngineConfig.soft404_filter):
an HTTP-200 error template produces no record/webtext row, but the visit
still counts — the URL is fetched once, marked seen, and never re-popped."""

from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

ERR_HTML = (
    '<html><body><h1 class="title">Error 404 - page not found</h1>'
    '<table class="fields"></table>'
    '<div class="images"></div><div class="related"></div>'
    "</body></html>"
)


def _site_with_error_page():
    site = generate_site(SiteSpec(n_hosts=1, details_per_host=8, limit=4))
    pages = site["pages"].copy()
    # replace one real record page with an HTTP-200 error template
    mask = pages["url"].str.contains("/record/")
    victim = pages[mask].iloc[0]["url"]
    pages.loc[pages["url"] == victim, "html"] = ERR_HTML.encode()
    pages.loc[pages["url"] == victim, "text"] = "Error 404 - page not found"
    s = dict(site)
    s["pages"] = pages
    return s, victim


def _run(spark, tmp_path, site, **cfg_kw):
    sdfs = site_to_spark(spark, site)
    cfg = EngineConfig(ckpt_dir=str(tmp_path), **cfg_kw)
    return CrawlEngine(
        spark, sdfs["pages"], sdfs["seeds"], sdfs["politeness"], cfg
    ).run()


def test_soft404_suppresses_record_but_not_visit(spark, tmp_path):
    site, victim = _site_with_error_page()
    # baseline: the error template IS emitted as a (junk) record
    base = _run(spark, tmp_path / "a", site)
    base_urls = {r["url"] for r in base.records.select("url").collect()}
    assert victim in base_urls

    # filtered: same crawl, the template never reaches the sinks
    res = _run(spark, tmp_path / "b", site, soft404_filter=True)
    got = {r["url"] for r in res.records.select("url").collect()}
    assert victim not in got
    assert got == base_urls - {victim}  # healthy records unaffected
    wt = {r["url"] for r in res.webtext.select("url").collect()}
    assert victim not in wt

    # the visit counted: an idempotent re-run on the complete checkpoint
    # pops nothing (the suppressed URL is seen, not re-fetched forever)
    again = _run(spark, tmp_path / "b", site, soft404_filter=True)
    assert {r["url"] for r in again.records.select("url").collect()} == got


def test_healthy_long_page_mentioning_404_is_kept(spark, tmp_path):
    # phrase alone (long body) must NOT suppress — is_soft404 requires
    # phrase AND short; a catalog note merely mentioning "not found" stays
    site = generate_site(SiteSpec(n_hosts=1, details_per_host=8, limit=4))
    pages = site["pages"].copy()
    mask = pages["url"].str.contains("/record/")
    victim = pages[mask].iloc[0]["url"]
    filler = " ".join(["provenance archive catalogue"] * 60)
    long_html = (
        '<html><body><h1 class="title">Record note</h1>'
        '<table class="fields"><tr class="field">'
        '<td class="label">Description</td>'
        f'<td class="value">original page not found in 1902; {filler}</td>'
        "</tr></table>"
        '<div class="images"></div><div class="related"></div>'
        "</body></html>"
    )
    pages.loc[pages["url"] == victim, "html"] = long_html.encode()
    pages.loc[pages["url"] == victim, "text"] = (
        f"Record note\nDescription\toriginal page not found in 1902; {filler}"
    )
    s = dict(site)
    s["pages"] = pages
    res = _run(spark, tmp_path, s, soft404_filter=True)
    got = {r["url"] for r in res.records.select("url").collect()}
    assert victim in got
