"""Sitemap discovery (operators/sitemaps.py): XML-subset parsing, the
bounded live wave (root + one sitemapindex child level), and an engine run
where URLs only reachable through the sitemap get crawled."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://h0.example.test/page?a=1&amp;b=2</loc>
    <lastmod>2024-01-15</lastmod>
    <priority>0.9</priority>
  </url>
  <url><loc> http://h0.example.test/plain </loc></url>
  <url><priority>0.1</priority></url>
  <url><loc>http://h0.example.test/it&apos;s</loc><priority>bogus</priority></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h0.example.test/sitemap-a.xml</loc><priority>0.8</priority></sitemap>
  <sitemap><loc>http://h0.example.test/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_entries(spark):
    from crawler_spark.operators.sitemaps import parse_sitemap_entries

    df = spark.createDataFrame(
        [("s1", URLSET.encode()), ("s2", INDEX.encode())],
        "url string, body binary",
    )
    rows = parse_sitemap_entries(df).collect()
    urls = {r["loc"]: r for r in rows if r["kind"] == "url"}
    children = {r["loc"]: r for r in rows if r["kind"] == "sitemap"}
    # entity-unescaped loc, explicit priority + lastmod
    assert urls["http://h0.example.test/page?a=1&b=2"]["priority"] == 0.9
    assert urls["http://h0.example.test/page?a=1&b=2"]["lastmod"] == "2024-01-15"
    # whitespace-trimmed loc, protocol-default priority, null lastmod
    assert urls["http://h0.example.test/plain"]["priority"] == 0.5
    assert urls["http://h0.example.test/plain"]["lastmod"] is None
    # &apos; unescaped; non-numeric priority falls back to the default
    assert urls["http://h0.example.test/it's"]["priority"] == 0.5
    # the loc-less entry is dropped: 3 url rows, not 4
    assert len(urls) == 3
    assert set(children) == {
        "http://h0.example.test/sitemap-a.xml",
        "http://h0.example.test/sitemap-b.xml",
    }
    assert children["http://h0.example.test/sitemap-a.xml"]["priority"] == 0.8


@pytest.fixture()
def sitemap_server():
    """Localhost host whose sitemap index leads to records the page graph
    never links: /extra/1 and /extra/2 exist only via the sitemap."""
    site = generate_site(SiteSpec(n_hosts=1, details_per_host=6, limit=3))
    by_path = {}
    for r in site["pages"].itertuples():
        by_path[r.url.split("example.test", 1)[1]] = bytes(r.html)

    placeholder = {}  # filled once the port is known

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = placeholder.get(self.path) or by_path.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/xml")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    placeholder["/sitemap.xml"] = (
        '<sitemapindex><sitemap><loc>'
        f"{base}/sitemap-child.xml</loc></sitemap></sitemapindex>"
    ).encode()
    placeholder["/sitemap-child.xml"] = (
        "<urlset>"
        f"<url><loc>{base}/extra/1</loc><priority>0.9</priority></url>"
        f"<url><loc>{base}/extra/2</loc><priority>0.2</priority></url>"
        "</urlset>"
    ).encode()
    placeholder["/extra/1"] = b"<html><body>extra one</body></html>"
    placeholder["/extra/2"] = b"<html><body>extra two</body></html>"
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield site, base
    srv.shutdown()


def test_sitemap_wave_bounded_discovery(spark, sitemap_server):
    from crawler_spark.operators.sitemaps import sitemap_wave

    _, base = sitemap_server
    host = base.split("//", 1)[1]
    hosts = spark.createDataFrame(
        [(host, f"{base}/search?page=1")], "host string, url string"
    )
    got = {r["url"]: r for r in sitemap_wave(hosts, timeout_s=5).collect()}
    assert set(got) == {f"{base}/extra/1", f"{base}/extra/2"}
    assert got[f"{base}/extra/1"]["priority"] == 0.9
    assert all(r["host"] == host for r in got.values())


def test_engine_crawls_sitemap_only_urls(spark, sitemap_server, tmp_path):
    site, base = sitemap_server
    host = base.split("//", 1)[1]
    seeds = site["seeds"].copy()
    seeds["url"] = seeds["url"].str.replace(
        r"http://h0\.example\.test", base, regex=True
    )
    pol = site["politeness"].copy()
    pol["host"] = host
    sdfs = site_to_spark(spark, {**site, "seeds": seeds, "politeness": pol})
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path / "ck"),
        fetch_mode="live",
        fetch_timeout_s=5,
        live_robots=True,
        robots_timeout_s=5,
        live_sitemaps=True,
    )
    res = CrawlEngine(
        spark, None, sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    ).run()
    fetched = {r["url"] for r in res.fetch_log.select("url").collect()}
    # sitemap-only pages were crawled, and the higher-priority one was
    # popped no later than the lower-priority one
    assert f"{base}/extra/1" in fetched and f"{base}/extra/2" in fetched
    rounds = {
        r["url"]: r["round"]
        for r in res.fetch_log.where(
            F.col("url").like("%/extra/%")
        ).collect()
    }
    assert rounds[f"{base}/extra/1"] <= rounds[f"{base}/extra/2"]
    # ordinary seed-reachable records still crawled
    assert any("/record/" in u for u in fetched)


def test_robots_sitemap_directive_overrides_default(spark):
    """A robots.txt Sitemap: directive replaces the /sitemap.xml fallback
    for that host — the decoy default must never be fetched."""
    state = {"default_hit": False}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/sitemap.xml":
                state["default_hit"] = True
            body = pages.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    pages = {
        "/robots.txt": (
            "User-agent: *\nDisallow:\n"
            f"Sitemap: {base}/maps/a.xml\n"
        ).encode(),
        "/maps/a.xml": (
            f"<urlset><url><loc>{base}/declared/1</loc></url></urlset>"
        ).encode(),
        "/sitemap.xml": (
            f"<urlset><url><loc>{base}/decoy/1</loc></url></urlset>"
        ).encode(),
    }
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        from crawler_spark.operators.sitemaps import sitemap_wave

        host = base.split("//", 1)[1]
        hosts = spark.createDataFrame(
            [(host, f"{base}/search?page=1")], "host string, url string"
        )
        got = {r["url"] for r in sitemap_wave(hosts, timeout_s=5).collect()}
        assert got == {f"{base}/declared/1"}
        assert not state["default_hit"]
    finally:
        srv.shutdown()


def test_sitemap_recrawl_candidates(spark):
    """lastmod newer than the stored warc_ts -> recrawl; older, equal,
    missing, or unparseable lastmod -> not."""
    from datetime import datetime

    from crawler_spark.operators.sitemaps import sitemap_recrawl_candidates

    wave = spark.createDataFrame(
        [
            ("h", "http://h/1", "2024-06-01", 0.5),          # newer -> recrawl
            ("h", "http://h/2", "2024-01-01", 0.5),          # older
            ("h", "http://h/3", None, 0.5),                  # no signal
            ("h", "http://h/4", "not-a-date", 0.5),          # unparseable
            ("h", "http://h/5", "2024-03-15T12:00:00", 0.5), # equal ts
            ("h", "http://h/9", "2024-06-01", 0.5),          # never crawled
        ],
        "host string, url string, lastmod string, priority double",
    )
    ts = datetime(2024, 3, 15, 12, 0, 0)
    crawled = spark.createDataFrame(
        [(f"http://h/{i}", ts) for i in (1, 2, 3, 4, 5)],
        "url string, warc_ts timestamp",
    )
    got = {r["url"]: r["connector_id"]
           for r in sitemap_recrawl_candidates(wave, crawled).collect()}
    assert got == {"http://h/1": "sitemap"}
