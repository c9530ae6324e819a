"""Live-HTTP fetch path (J2 live mode) against a localhost server — the
in-sandbox stand-in for real crawling. Covers: real sockets through the
mapInPandas worker, per-host crawl-delay enforcement, 4xx-permanent vs
5xx/network-retryable, and a FULL CrawlEngine run in fetch_mode="live" with
byte parity vs the sequential oracle."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from crawler_spark.oracle.replay import replay
from crawler_spark.plans.rounds import CrawlEngine, EngineConfig
from crawler_spark.sources.sitegen import SiteSpec, generate_site, site_to_spark


@pytest.fixture(scope="module")
def site():
    return generate_site(
        SiteSpec(n_hosts=1, details_per_host=12, limit=5, related_per_host=2)
    )


@pytest.fixture(scope="module")
def server(site):
    """Serve the synthetic site's pages by path on 127.0.0.1."""
    by_path = {}
    for r in site["pages"].itertuples():
        path = r.url.split("example.test", 1)[1]
        by_path[path] = bytes(r.html)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = by_path.get(self.path)
            if self.path == "/boom":
                self.send_response(500)
                self.end_headers()
                return
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _localized(site, base):
    """Rewrite the site's seed/page URLs onto the localhost base."""
    s = dict(site)
    seeds = site["seeds"].copy()
    seeds["url"] = seeds["url"].str.replace(
        r"http://h0\.example\.test", base, regex=True
    )
    s["seeds"] = seeds
    pol = site["politeness"].copy()
    pol["host"] = base.split("//", 1)[1]  # 127.0.0.1:port
    s["politeness"] = pol
    return s


def test_live_fetch_statuses(spark, server):
    from crawler_spark.operators.fetch import live_fetch, live_retryable, split_retries

    rows = [
        (f"{server}/record/1", "127.0.0.1", 0),
        (f"{server}/nonexistent", "127.0.0.1", 0),
        (f"{server}/boom", "127.0.0.1", 0),
        ("http://127.0.0.1:1/unreachable", "127.0.0.1", 0),
    ]
    batch = spark.createDataFrame(
        rows, "url string, host string, attempts int"
    )
    out = {r["url"]: r for r in live_fetch(batch, timeout_s=5).collect()}
    assert out[f"{server}/record/1"]["status"] == 200
    assert out[f"{server}/record/1"]["bytes"] > 0
    assert out[f"{server}/nonexistent"]["status"] == 404
    assert out[f"{server}/boom"]["status"] == 500
    assert out["http://127.0.0.1:1/unreachable"]["status"] == -1

    ok, retry, dead = split_retries(
        live_fetch(batch, timeout_s=5), max_attempts=5, retryable=live_retryable()
    )
    assert ok.count() == 1
    retry_urls = {r["url"] for r in retry.collect()}
    dead_urls = {r["url"] for r in dead.collect()}
    assert f"{server}/boom" in retry_urls  # 5xx retries
    assert "http://127.0.0.1:1/unreachable" in retry_urls  # network retries
    assert f"{server}/nonexistent" in dead_urls  # 404 permanent


def test_live_crawl_end_to_end_parity(spark, site, server, tmp_path):
    local = _localized(site, server)
    sdfs = site_to_spark(spark, local)
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path / "ck"), default_budget=8,
        fetch_mode="live", fetch_timeout_s=10,
    )
    res = CrawlEngine(
        spark, None, sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=site["connectors"],
    ).run()

    # oracle over the SAME localhost urls
    pages = {
        r.url.replace("http://h0.example.test", server): r.html
        for r in site["pages"].itertuples()
    }
    oracle = replay(pages, local["seeds"].to_dict("records"), site["connectors"])
    got = {r["url"]: r["text"] for r in res.webtext.collect()}
    assert got == oracle.webtext  # byte-identical over real HTTP
    assert res.records.count() == len(oracle.webtext)


def test_live_mode_no_salt_one_worker_per_host(spark):
    """salt=False (live fetch): every host lands in exactly ONE partition,
    so the in-worker crawl-delay bounds the host's aggregate request rate —
    salting would let k workers each honor the delay independently (k× the
    allowed rate)."""
    from pyspark.sql import functions as F

    from crawler_spark.operators.politeness import salted_host_repartition

    batch = spark.range(900).select(
        F.concat(F.lit("http://h"), (F.col("id") % 3).cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string"),
                 F.lit(".test")).alias("host"),
        F.lit(0).alias("depth"), F.lit(0).alias("seed_idx"),
        F.lit(0).alias("page_no"), F.lit(0).alias("in_page_idx"),
        F.lit(0).alias("dfs_rank"),
    )
    out = salted_host_repartition(batch, target_per_task=10, salt=False)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("host")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .collect()
    )
    assert parts and all(r["n_parts"] == 1 for r in parts)
    # salted default DOES spread a 300-row host over multiple buckets
    salted = salted_host_repartition(batch, target_per_task=10)
    sparts = (
        salted.withColumn("pid", F.spark_partition_id())
        .groupBy("host")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .collect()
    )
    assert any(r["n_parts"] > 1 for r in sparts)


# ---------------------------------------------------------------------------
# POST connectors (joconde _msearch NDJSON / paris-musees GraphQL /
# ceres-mcu form fields): request templates + a full live POST crawl


def test_build_request_shapes():
    from crawler_spark.operators.extract import ConnectorConfig
    from crawler_spark.operators.fetch import build_request

    # no config / GET config: passthrough
    assert build_request("http://h/x?a=1", "search", None) == (
        "http://h/x?a=1", None, {},
    )
    cfg = ConnectorConfig(
        connector_id="c",
        method="POST",
        content_type="application/x-www-form-urlencoded",
        body_template="q=silk&page={page}&limit={limit}",
        detail_body_template="ref={id}",
        strip_params=("page",),
        body_defaults={"limit": 24},
    )
    # search row: URL param fills {page}, default fills {limit},
    # identity param stripped from the sent URL (ceres-mcu.js:111-118)
    url, data, hdrs = build_request("http://h/search?page=3", "search", cfg)
    assert url == "http://h/search"
    assert data == b"q=silk&page=3&limit=24"
    assert hdrs == {"Content-Type": "application/x-www-form-urlencoded"}
    # detail row: {id} = last path segment (joconde.js:44-51 term query)
    url, data, _ = build_request("http://h/notice/7.1.2", "record", cfg)
    assert (url, data) == ("http://h/notice/7.1.2", b"ref=7.1.2")
    # POST connector without a detail template: details stay GET
    cfg2 = ConnectorConfig(
        connector_id="c", method="POST", body_template="x={page}"
    )
    assert build_request("http://h/notice/1", "record", cfg2) == (
        "http://h/notice/1", None, {},
    )


@pytest.fixture(scope="module")
def post_site():
    return generate_site(
        SiteSpec(
            n_hosts=1, details_per_host=8, limit=4, related_per_host=2,
            msearch_hosts=(0,),
        )
    )


@pytest.fixture(scope="module")
def post_server(post_site):
    """An _msearch-style endpoint: every page is served over POST only —
    /search resolves the page from the NDJSON body's "from", details from
    the path. GET returns 405 so any GET regression fails loudly."""
    import re

    by_key = {}
    for r in post_site["pages"].itertuples():
        by_key[r.url.split("example.test", 1)[1]] = bytes(r.html)
    requests_seen = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode("utf-8")
            requests_seen.append(
                (self.path, self.headers.get("Content-Type"), body)
            )
            if self.path == "/search":
                m = re.search(r'"from":(\d+)', body)
                key = f"/search?offset={m.group(1)}" if m else None
            else:
                key = self.path
            page = by_key.get(key)
            if page is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(page)

        def do_GET(self):
            self.send_response(405)  # POST-only endpoint
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", requests_seen
    srv.shutdown()


def test_live_post_crawl_parity(spark, post_site, post_server, tmp_path):
    """Full live CrawlEngine over a POST-only _msearch host: byte parity vs
    the sequential replay oracle, and the wire really carried NDJSON POST
    bodies with the connector's Content-Type."""
    base, requests_seen = post_server
    local = _localized(post_site, base)
    sdfs = site_to_spark(spark, local)
    cfg = EngineConfig(
        ckpt_dir=str(tmp_path / "ck"), default_budget=8,
        fetch_mode="live", fetch_timeout_s=10,
    )
    res = CrawlEngine(
        spark, None, sdfs["seeds"], sdfs["politeness"], cfg,
        connectors=post_site["connectors"],
    ).run()

    pages = {
        r.url.replace("http://h0.example.test", base): r.html
        for r in post_site["pages"].itertuples()
    }
    oracle = replay(
        pages, local["seeds"].to_dict("records"), post_site["connectors"]
    )
    got = {r["url"]: r["text"] for r in res.webtext.collect()}
    assert got == oracle.webtext and len(got) > 0

    # the wire saw POST NDJSON: search bodies carry "from", detail bodies a
    # REF term, and every request the connector's content type
    assert requests_seen
    assert all(ct == "application/x-ndjson" for _, ct, _ in requests_seen)
    search_bodies = [b for p, _, b in requests_seen if p == "/search"]
    assert search_bodies and all('"from":' in b for b in search_bodies)
    detail_bodies = [b for p, _, b in requests_seen if p != "/search"]
    assert detail_bodies and all('"term":{"REF":"' in b for b in detail_bodies)


def test_live_secondary_chain_parity(spark, tmp_path):
    """Full live-mode crawl over a gallica-style secondary host: the
    notice→book enrichment hops go over REAL sockets (through
    live_secondary_batch's per-host partitioning) and the merged webtext
    byte-matches the sequential replay oracle."""
    site = generate_site(
        SiteSpec(n_hosts=1, details_per_host=6, limit=3,
                 secondary_hosts=(0,))
    )
    by_path = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = by_path.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        # secondary URLs live in FIELD VALUES as absolute URLs
        # (gallica.js:83-89), so the page bodies themselves must be
        # rewritten onto the localhost base, not just the seeds
        old = b"http://h0.example.test"
        for r in site["pages"].itertuples():
            path = r.url.split("example.test", 1)[1]
            by_path[path] = bytes(r.html).replace(old, base.encode())

        local = _localized(site, base)
        sdfs = site_to_spark(spark, local)
        cfg = EngineConfig(
            ckpt_dir=str(tmp_path / "ck"), default_budget=8,
            fetch_mode="live", fetch_timeout_s=10,
        )
        res = CrawlEngine(
            spark, None, sdfs["seeds"], sdfs["politeness"], cfg,
            connectors=site["connectors"],
        ).run()

        pages = {
            r.url.replace("http://h0.example.test", base): bytes(
                r.html
            ).replace(old, base.encode())
            for r in site["pages"].itertuples()
        }
        oracle = replay(
            pages, local["seeds"].to_dict("records"), site["connectors"]
        )
        got = {r["url"]: r["text"] for r in res.webtext.collect()}
        assert got == oracle.webtext
        # the chain really ran over HTTP: merged notice lines are present
        assert any("notice.url\t" in t for t in got.values())
    finally:
        srv.shutdown()


def test_build_request_session_fields():
    """Session fields harvested from earlier responses fill body-template
    placeholders; URL params still win (identity beats harvested state)."""
    from crawler_spark.operators.extract import ConnectorConfig
    from crawler_spark.operators.fetch import build_request

    cfg = ConnectorConfig(
        connector_id="c",
        method="POST",
        body_template="page={page}&__VIEWSTATE={viewstate}&ev={ev}",
        session_field_regex={
            "viewstate": r'name="__VIEWSTATE" value="([^"]*)"',
            "ev": r'name="__EVENTVALIDATION" value="([^"]*)"',
        },
    )
    url, data, _ = build_request(
        "http://h/search?page=3", "search", cfg,
        session={"viewstate": "VS9", "ev": "E1"},
    )
    assert data == b"page=3&__VIEWSTATE=VS9&ev=E1"
    # no session yet: fields render '' (the handshake normally fills them)
    _, data, _ = build_request("http://h/search?page=3", "search", cfg)
    assert data == b"page=3&__VIEWSTATE=&ev="
    # URL params override session values of the same name
    _, data, _ = build_request(
        "http://h/search?page=3&ev=fromurl", "search", cfg,
        session={"viewstate": "VS9", "ev": "stale"},
    )
    assert data == b"page=3&__VIEWSTATE=VS9&ev=fromurl"


def test_live_viewstate_post_paging(spark, tmp_path):
    """S6 completion (imatex.js:41-107,122-131): a full live crawl over an
    ASP.NET-style host where every search POST must carry a __VIEWSTATE
    token issued by a PREVIOUS response on the same host. The worker
    handshakes (GET the form), harvests the token, splices it into each
    POST, and re-harvests from every response — the server rejects any
    POST with a missing/unissued/reused token, so paging only works if the
    response-derived body state really flows request-to-request."""
    import dataclasses
    import re
    from urllib.parse import parse_qsl

    site = generate_site(
        SiteSpec(n_hosts=1, details_per_host=8, limit=4, related_per_host=0)
    )
    by_path = {}
    for r in site["pages"].itertuples():
        by_path[r.url.split("example.test", 1)[1]] = bytes(r.html)

    issued: set = set()
    used: set = set()
    violations: list = []
    post_pages: list = []
    counter = [0]

    def fresh() -> str:
        counter[0] += 1
        t = f"VS{counter[0]}"
        issued.add(t)
        return t

    def stamp(body: bytes) -> bytes:
        # ASP.NET re-issues a fresh token with every response; a comment
        # keeps the DOM (and extraction parity) untouched
        return body + f'<!--name="__VIEWSTATE" value="{fresh()}"-->'.encode()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/form":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(stamp(b"<html><body>form</body></html>"))
                return
            if self.path.startswith("/search"):
                self.send_response(405)  # search pages are POST-only
                self.end_headers()
                return
            body = by_path.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            fields = dict(parse_qsl(self.rfile.read(n).decode()))
            tok = fields.get("__VIEWSTATE", "")
            if tok not in issued or tok in used:
                violations.append((self.path, fields))
                self.send_response(409)
                self.end_headers()
                return
            used.add(tok)
            page = by_path.get(f"/search?page={fields.get('page')}")
            post_pages.append(fields.get("page"))
            if page is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(stamp(page))

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        local = _localized(site, base)
        connectors = {
            cid: dataclasses.replace(
                c,
                method="POST",
                content_type="application/x-www-form-urlencoded",
                body_template="page={page}&__VIEWSTATE={viewstate}",
                strip_params=("page",),
                session_field_regex={
                    "viewstate": r'name="__VIEWSTATE" value="([^"]*)"'
                },
                session_handshake_url="/form",
            )
            for cid, c in site["connectors"].items()
        }
        sdfs = site_to_spark(spark, local)
        cfg = EngineConfig(
            ckpt_dir=str(tmp_path / "ck"), default_budget=8,
            fetch_mode="live", fetch_timeout_s=10,
        )
        res = CrawlEngine(
            spark, None, sdfs["seeds"], sdfs["politeness"], cfg,
            connectors=connectors,
        ).run()

        assert not violations, violations
        assert sorted(post_pages) == ["1", "2"]  # both pages POSTed once
        # extraction parity vs the sequential oracle over the clean corpus
        pages = {
            r.url.replace("http://h0.example.test", base): r.html
            for r in site["pages"].itertuples()
        }
        oracle = replay(
            pages, local["seeds"].to_dict("records"), site["connectors"]
        )
        got = {r["url"]: r["text"] for r in res.webtext.collect()}
        assert got == oracle.webtext and len(got) > 0
    finally:
        srv.shutdown()


def test_live_robots_acquired_and_enforced(spark, tmp_path):
    """Live robots.txt acquisition: NO user-supplied politeness table — the
    engine's run-start wave fetches /robots.txt itself, and the parsed
    disallow prefix + crawl-delay are enforced for the whole crawl: the
    disallowed record is never requested, and same-host requests are spaced
    by the served Crawl-delay."""
    import time as _time

    site = generate_site(
        SiteSpec(n_hosts=1, details_per_host=6, limit=3, related_per_host=0)
    )
    by_path = {}
    for r in site["pages"].itertuples():
        by_path[r.url.split("example.test", 1)[1]] = bytes(r.html)
    robots = b"User-agent: *\nDisallow: /record/3\nCrawl-delay: 0.3\n"
    arrivals: list = []
    paths_seen: list = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            arrivals.append(_time.monotonic())
            paths_seen.append(self.path)
            if self.path == "/robots.txt":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(robots)
                return
            body = by_path.get(self.path)
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
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        local = _localized(site, base)
        sdfs = site_to_spark(spark, local)
        cfg = EngineConfig(
            ckpt_dir=str(tmp_path / "ck"), default_budget=8,
            fetch_mode="live", fetch_timeout_s=10,
        )
        res = CrawlEngine(
            spark, None, sdfs["seeds"], politeness=None, cfg=cfg,
            connectors=site["connectors"],
        ).run()

        assert "/robots.txt" in paths_seen  # the wave really probed
        fetched = {r["url"] for r in res.fetch_log.collect()}
        assert f"{base}/record/3" not in fetched  # disallow enforced
        got = {
            r["url"] for r in res.records.select("url").collect()
        }
        expect = {
            f"{base}/record/{i}" for i in range(1, 7) if i != 3
        }
        assert got == expect
        # crawl-delay honored between same-host CRAWL requests (the probe
        # runs in its own stage; measure gaps after it)
        crawl_arrivals = [
            t for t, p in zip(arrivals, paths_seen) if p != "/robots.txt"
        ]
        gaps = [b - a for a, b in zip(crawl_arrivals, crawl_arrivals[1:])]
        assert gaps and all(g >= 0.25 for g in gaps), gaps
    finally:
        srv.shutdown()


def test_robots_unreachable_is_transient_disallow(spark, tmp_path):
    """RFC 9309 §2.3.1.4: an UNREACHABLE robots.txt (5xx/network) means
    complete disallow — but the probe must stay TRANSIENT: the engine
    blocks the host (crawl run ends with nothing fetched), and the next
    run re-probes instead of trusting the failed probe forever. Once the
    server recovers, the real rules apply (4xx stays cacheable allow-all)."""
    robots_calls = [0]

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                robots_calls[0] += 1
                if robots_calls[0] == 1:
                    self.send_response(503)  # transient outage
                    self.end_headers()
                    return
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"User-agent: *\nDisallow: /record/3\n")
                return
            body = by_path.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    site = generate_site(
        SiteSpec(n_hosts=1, details_per_host=6, limit=3, related_per_host=0)
    )
    by_path = {
        r.url.split("example.test", 1)[1]: bytes(r.html)
        for r in site["pages"].itertuples()
    }
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        local = _localized(site, base)
        sdfs = site_to_spark(spark, local)
        cfg = EngineConfig(
            ckpt_dir=str(tmp_path / "ck"), default_budget=8,
            fetch_mode="live", fetch_timeout_s=10,
        )

        def run():
            return CrawlEngine(
                spark, None, sdfs["seeds"], politeness=None, cfg=cfg,
                connectors=site["connectors"],
            ).run()

        first = run()
        # outage round: complete disallow — nothing fetched, run ends
        assert first.records.count() == 0
        assert first.fetch_log.count() == 0

        second = run()  # server recovered: re-probe, real rules enforced
        assert robots_calls[0] >= 2, "transient probe was never retried"
        got = {r["url"] for r in second.records.select("url").collect()}
        assert got == {
            f"{base}/record/{i}" for i in range(1, 7) if i != 3
        }
    finally:
        srv.shutdown()


def test_robots_ttl_reprobe_picks_up_changed_rules(spark, tmp_path):
    """robots_ttl_rounds: cached robots rows age out, so a rule change
    mid-crawl is picked up — the run starts under allow-all, the server
    flips to 'Disallow: /record/5' after the first probe, and the record
    (discovered on a later page) is never fetched."""
    robots_calls = [0]

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                robots_calls[0] += 1
                self.send_response(200)
                self.end_headers()
                if robots_calls[0] == 1:
                    self.wfile.write(b"User-agent: *\nDisallow:\n")
                else:
                    self.wfile.write(b"User-agent: *\nDisallow: /record/5\n")
                return
            body = by_path.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    site = generate_site(
        SiteSpec(n_hosts=1, details_per_host=6, limit=3, related_per_host=0)
    )
    by_path = {
        r.url.split("example.test", 1)[1]: bytes(r.html)
        for r in site["pages"].itertuples()
    }
    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        local = _localized(site, base)
        sdfs = site_to_spark(spark, local)
        cfg = EngineConfig(
            ckpt_dir=str(tmp_path / "ck"), default_budget=8,
            fetch_mode="live", fetch_timeout_s=10, robots_ttl_rounds=1,
        )
        res = CrawlEngine(
            spark, None, sdfs["seeds"], politeness=None, cfg=cfg,
            connectors=site["connectors"],
        ).run()
        assert robots_calls[0] >= 2, "TTL never re-probed"
        got = {r["url"] for r in res.records.select("url").collect()}
        # /record/5 sits on page 2, fetched only after the rule flip
        assert got == {f"{base}/record/{i}" for i in range(1, 7) if i != 5}
    finally:
        srv.shutdown()


def test_live_fetch_enforces_crawl_delay(spark):
    """The in-worker crawl-delay really spaces a host's requests: with
    crawl_delay_ms=400 the server must observe >=400ms between arrivals.
    (Regression: named itertuples renames underscore columns, which once
    turned the delay lookup into a constant 0 — no test measured time.)"""
    import time as _time

    from crawler_spark.operators.fetch import live_fetch

    arrivals: list = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            arrivals.append(_time.monotonic())
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        batch = spark.createDataFrame(
            [(f"{base}/p{i}", "127.0.0.1", 0, 400) for i in range(3)],
            "url string, host string, attempts int, crawl_delay_ms int",
        ).coalesce(1)
        out = live_fetch(batch, timeout_s=5).collect()
        assert all(r["status"] == 200 for r in out)
        gaps = [b - a for a, b in zip(arrivals, arrivals[1:])]
        assert len(gaps) == 2 and all(g >= 0.35 for g in gaps), gaps
    finally:
        srv.shutdown()
